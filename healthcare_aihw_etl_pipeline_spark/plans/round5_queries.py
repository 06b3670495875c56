"""Round-5 query surface: duplication census, similarity joins,
co-occurrence mining, sessionized paths, histograms, set operations,
exact-moment regression, LSH diagnostics, and window position functions.

Every query carries a DuckDB oracle; cross-engine hash-exactness comes
from the same discipline as the rest of the registry (plans/registry.py):
integer arithmetic wherever a sum can overflow-free (cents(), BIGINT
moments), a single IEEE double expression — written identically on both
sides — where division/sqrt is unavoidable, and a TOTAL order under
every LIMIT so the result set is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.functions.scalar import bind
from healthcare_aihw_etl_pipeline_spark.plans.registry import cents, register
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table, spread


def _word_ngrams(text_col: str, n: int) -> F.Column:
    """Array of space-joined word n-grams of `text_col`.

    The token array is let-bound (functions.scalar.bind) so the split
    runs once per row, not once per n-gram — Catalyst does no CSE across
    higher-order-function lambda scopes (the O(len²) trap documented in
    BASELINE.md round 4). Rows shorter than n tokens yield an empty
    array (guarded: Spark's sequence(1, 0) would count DOWN).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return bind(
        toks,
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


@register(
    "duplicate_ngram_top20",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+7], ' ') AS ngram
      FROM toks, unnest(generate_series(1, len(t) - 7)) AS g(i)
      WHERE len(t) >= 8
    )
    SELECT ngram,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM grams
    GROUP BY ngram
    ORDER BY n_docs DESC, n_occurrences DESC, ngram ASC
    LIMIT 20
    """,
    doc="Duplicated-passage census: the 20 word-8-grams shared by the "
    "most documents (the signal behind exact-substring dedup, Lee et al. "
    "2022 — boilerplate/licence headers surface immediately). Shape: "
    "explode n-grams -> ONE shuffle on the gram key with map-side "
    "partial (count, count-distinct) -> TakeOrdered 20. At 100 TB the "
    "gram string is replaced by a 64-bit rolling hash (operators.text."
    "rolling_fingerprint) so the shuffle carries 8-byte keys; the "
    "(n_docs, n_occurrences, ngram) sort key is total, so the LIMIT "
    "boundary is engine-independent.",
)
def duplicate_ngram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(_word_ngrams("text", 8)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("ngram"))
        .limit(20)
    )


@register(
    "jaccard_pair_similarity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM toks, unnest(generate_series(1, len(t) - 4)) AS s(i)
      WHERE len(t) >= 5
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.n_inter,
           sa.n + sb.n - i.n_inter AS n_union,
           ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
    doc="EXACT n-gram Jaccard similarity join (5-gram sets, threshold "
    "0.5) via an inverted index: distinct (doc, gram) -> self-join on "
    "the gram -> per-pair intersection count -> set sizes joined back -> "
    "integer threshold test 2*inter >= union (exact; the double divide "
    "happens only in the reported score). This is the ground-truth "
    "companion to MinHash: same pairs, no approximation. Scale: pair "
    "fan-out is sum over grams of df² — bounded by capping gram document "
    "frequency (drop grams with df > K: stopword-like grams dominate "
    "cost, add no signal) and verifying survivors exactly, the standard "
    "prefix-filtering refinement; the sf-scale corpus needs no cap.",
)
def jaccard_pair_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.explode(_word_ngrams("text", 5)).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("_nb"))
    uni = F.col("_na") + F.col("_nb") - F.col("n_inter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(2 * F.col("n_inter") >= uni)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            uni.alias("n_union"),
            F.round(F.col("n_inter").cast("double") / uni, 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )


@register(
    "part_pair_cooccurrence",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
    doc="Market-basket co-occurrence: the 20 part pairs bought together "
    "in the most orders. Distinct (order, part) first — a part twice in "
    "one order is one basket membership — then a self-equi-join on the "
    "order key. Scale: fan-out per order is C(lines,2) with lines "
    "small-bounded by the data model (~7), so the join output is linear "
    "in orders; the pair aggregation shuffles with map-side combine. A "
    "skew-heavy basket domain (one mega-order) would need a per-order "
    "line cap, the same guard as every self-join.",
)
def part_pair_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@register(
    "top_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM e
    ),
    p AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, sess
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
    doc="Behavioral path mining: sessionize each user's events on a "
    "30-minute inactivity gap (lag + running-sum-of-breaks — the batch "
    "twin of the streaming session window in streaming/events.py), "
    "concatenate each session's event types in (ts, event_id) order, "
    "and count the 20 most common paths. The ordered concatenation is "
    "array_sort(collect_list(struct)) — deterministic because (ts, "
    "event_id) is a total order within a session. Scale: one shuffle on "
    "user_id for the windows, one on the session key (already "
    "co-partitioned), one map-side-combined count on the path string.",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("long")
    sess = ev.withColumn(
        "sess",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = (
        sess.groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda r: r["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@register(
    "value_histogram",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT CAST(LEAST(FLOOR((value - lo) / ((hi - lo) / 20.0)), 19)
                AS BIGINT) AS bucket,
           COUNT(*) AS n_events,
           ROUND(MIN(value), 6) AS min_v,
           ROUND(MAX(value), 6) AS max_v
    FROM events, b
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Equi-width 20-bucket histogram of events.value: bounds from one "
    "scalar aggregate, broadcast to the binning scan (crossJoin of a "
    "1-row aggregate — a broadcast, never a shuffle). The bucket "
    "expression floor((v-lo)/w) is a single IEEE-double computation "
    "written identically on both engines, so bucket boundaries agree "
    "bit-for-bit. Scale: two scans (bounds, bin+count) — the classic "
    "two-pass histogram; a one-pass variant uses fixed or sketched "
    "bounds.",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / width), F.lit(19)
    ).cast("long")
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
        )
        .orderBy("bucket")
    )


@register(
    "event_volume_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS cnt,
             SUM(n) AS s1, SUM(n * n) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           ROUND((d.n * s.cnt - s.s1) /
                 (s.cnt * sqrt((s.cnt * s.s2 - s.s1 * s.s1)
                               / (s.cnt * (s.cnt - 1.0)))), 6) AS z
    FROM daily d JOIN stats s ON s.event_type = d.event_type
    WHERE s.cnt > 1 AND s.cnt * s.s2 > s.s1 * s.s1
    ORDER BY ABS(ROUND((d.n * s.cnt - s.s1) /
                 (s.cnt * sqrt((s.cnt * s.s2 - s.s1 * s.s1)
                               / (s.cnt * (s.cnt - 1.0)))), 6)) DESC,
             d.event_type ASC, d.day ASC
    LIMIT 20
    """,
    doc="Volume-anomaly detection: z-score of each (event_type, day) "
    "daily count against that type's own distribution, top 20 by |z|. "
    "NOT stddev_samp(): Spark's moment-based variance merges partials "
    "in nondeterministic order, so its last-ulp float differs run to "
    "run and can never hash-match another engine. Instead the moments "
    "are EXACT BIGINT sums (cnt, Σn, Σn²) — associative, order-"
    "independent — and the one double expression (subtract, divide, "
    "sqrt) is written identically on both sides: bit-equal output. "
    "Scale: daily rollup shuffles once on (type, day); the per-type "
    "stats are a second tiny aggregate broadcast back to the days.",
)
def event_volume_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # day as an ISO STRING, not DateType: the driver's hash runs over
    # pandas frames where Spark dates land as datetime.date but DuckDB
    # dates land as datetime64 — strings compare identically everywhere
    # (same convention as daily_revenue_gap_filled).
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    z = F.round(
        (F.col("n") * F.col("cnt") - F.col("s1"))
        / (
            F.col("cnt")
            * F.sqrt(
                (F.col("cnt") * F.col("s2") - F.col("s1") * F.col("s1"))
                / (F.col("cnt") * (F.col("cnt") - F.lit(1.0)))
            )
        ),
        6,
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .where(
            (F.col("cnt") > 1)
            & (F.col("cnt") * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select("event_type", "day", "n", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), F.asc("event_type"), F.asc("day"))
        .limit(20)
    )


@register(
    "customer_segment_setops",
    oracle="""
    WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         w  AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'both' AS segment,
           (SELECT COUNT(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM w)) AS n
    UNION ALL
    SELECT 'rich_only',
           (SELECT COUNT(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM w))
    UNION ALL
    SELECT 'buyers_only',
           (SELECT COUNT(*) FROM (SELECT * FROM w EXCEPT SELECT * FROM hi))
    ORDER BY segment
    """,
    doc="Set-operation surface (INTERSECT / EXCEPT — the one relational "
    "algebra family the registry did not yet exercise): high-balance "
    "customers vs customers with orders, partitioned into both / "
    "rich-only / buyers-only with distinct-set semantics (DataFrame "
    ".intersect/.subtract compile to left-semi/left-anti joins over "
    "distinct inputs — same shuffle shape as EXISTS). Scale: each leg "
    "is one equi-shuffle on the key; counts combine map-side.",
)
def customer_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    hi = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    w = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()

    def seg(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("segment"), "n"
        )

    return (
        seg("both", hi.intersect(w))
        .unionByName(seg("rich_only", hi.subtract(w)))
        .unionByName(seg("buyers_only", w.subtract(hi)))
        .orderBy("segment")
    )


@register(
    "price_quantity_regression",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sx,
             SUM(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx,
             SUM(CAST(round(l_extendedprice) AS BIGINT)
                 * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
      FROM lineitem
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS corr,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sx) / n, 6) AS intercept
    FROM m
    """,
    doc="Pearson correlation + OLS slope/intercept of extendedprice on "
    "quantity — the regression-aggregate family, built the hash-stable "
    "way: corr()/regr_slope() merge float moments in partial-aggregation "
    "order (nondeterministic last ulp), so instead the five moments are "
    "EXACT BIGINT sums over unit-scaled integers (quantity and dollar-"
    "rounded price keep every product far below 2^63), converted to "
    "double only inside one final expression written identically in "
    "both engines. One scan, one map-side-combined aggregate, one row.",
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = cents("l_quantity", 0)
    y = cents("l_extendedprice", 0)
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = nd * F.col("sxy") - sxd * F.col("sy")
    var_x = nd * F.col("sxx") - sxd * F.col("sx")
    var_y = nd * F.col("syy") - syd * F.col("sy")
    slope = cov_n / var_x
    return m.select(
        "n",
        F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("corr"),
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "lsh_bucket_histogram",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      FROM embeddings
    ),
    sig AS (
      SELECT vec_id, band,
             list_sum(list_transform(generate_series(1, 8),
               j -> CASE WHEN ev[band * 8 + j] >= 0
                         THEN CAST(1 AS BIGINT) << (j - 1) ELSE 0 END)) AS bucket
      FROM v, unnest(generate_series(0, 7)) AS g(band)
    ),
    sizes AS (
      SELECT band, bucket, COUNT(*) AS sz FROM sig GROUP BY band, bucket
    )
    SELECT sz AS bucket_size, COUNT(*) AS n_buckets
    FROM sizes GROUP BY sz
    ORDER BY bucket_size
    """,
    doc="LSH health diagnostic: the bucket-size distribution of the "
    "sign-band signature (8 bands x 8 sign bits — the same RNG-free "
    "banding embedding_near_dup_top20 uses, so the oracle replays the "
    "banding itself). The histogram is how you TUNE LSH at scale: "
    "candidate-pair cost is Σ size² per bucket, so a fat tail here "
    "means more bits per band (or skew-splitting) BEFORE running the "
    "pair join — measure, don't guess, applied to dedup. Two tiny "
    "shuffles: (band, bucket) sizes, then the size histogram.",
)
def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        sign_band_buckets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sig = emb.select(
        "vec_id",
        F.posexplode(sign_band_buckets("embedding", 8, 8)).alias(
            "band", "bucket"
        ),
    )
    sizes = sig.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("bucket_size"))
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("bucket_size")
    )


@register(
    "supplier_balance_position",
    oracle="""
    SELECT s_suppkey, s_name,
           ROUND(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 6)
             AS pct_rank,
           ROUND(cume_dist() OVER (ORDER BY s_acctbal, s_suppkey), 6)
             AS cume,
           nth_value(s_name, 3) OVER (ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_poorest
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey ASC
    LIMIT 20
    """,
    doc="Window position functions (percent_rank / cume_dist / "
    "nth_value with an explicit full frame) over the global supplier "
    "balance order — completing the ranking-function surface beyond "
    "row_number/rank/ntile. The window key (s_acctbal, s_suppkey) is a "
    "TOTAL order, so rank fractions and the nth row are deterministic "
    "on any engine. A global ORDER BY window is a single-partition "
    "sort by construction — fine for a ranked REPORT (output is "
    "LIMIT-bounded); per-group variants partition first.",
)
def supplier_balance_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        sup.select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.nth_value("s_name", 3).over(wf).alias("third_poorest"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(20)
        .drop("s_acctbal")
    )


@register(
    "regression_by_returnflag",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sx,
             SUM(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sx) / n, 6) AS intercept
    FROM m
    ORDER BY l_returnflag
    """,
    doc="GROUPED OLS (slope/intercept of price on quantity per return "
    "flag) — regression as an ordinary aggregation, not an ML-library "
    "escape: the per-group moments are exact BIGINT sums with map-side "
    "partial combine (one shuffle on the group key, group count many "
    "orders of magnitude below row count), and the final expression is "
    "one double formula identical on both engines. The grouped twin of "
    "price_quantity_regression; at 100 TB this shape fits millions of "
    "groups because state per group is five longs.",
)
def regression_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = cents("l_quantity", 0)
    y = cents("l_extendedprice", 0)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("l_returnflag")


@register(
    "time_rollup_revenue",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue,
           CAST(GROUPING(CAST(year(o_orderdate) AS INT)) * 4
                + GROUPING(CAST(quarter(o_orderdate) AS INT)) * 2
                + GROUPING(CAST(month(o_orderdate) AS INT)) AS BIGINT)
             AS lvl
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT),
                     CAST(quarter(o_orderdate) AS INT),
                     CAST(month(o_orderdate) AS INT))
    ORDER BY lvl, y NULLS FIRST, q NULLS FIRST, m NULLS FIRST
    """,
    doc="Hierarchical time rollup (year -> quarter -> month -> grand "
    "total in ONE pass): the hypertable-rollup / materialized-"
    "aggregate shape, expressed as ROLLUP so Spark's Expand evaluates "
    "all four granularities from a single fact scan — at 100 TB this "
    "IS the continuous-aggregate build job, and the exact-cents sum "
    "makes every level bit-identical to a per-level recompute. "
    "GROUPING() disambiguates 'NULL month' rollup rows from genuine "
    "NULLs, exactly as the SQL standard intends.",
)
def time_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.plans.registry import dollars

    orders = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").alias("y")
    q = F.quarter("o_orderdate").alias("q")
    m = F.month("o_orderdate").alias("m")
    g = (
        F.grouping(F.col("y")) * 4
        + F.grouping(F.col("q")) * 2
        + F.grouping(F.col("m"))
    ).cast("long")
    return (
        orders.select(y, q, m, "o_totalprice")
        .rollup("y", "q", "m")
        .agg(
            dollars(F.sum(cents("o_totalprice")), "revenue"),
            g.alias("lvl"),
        )
        .orderBy(
            "lvl",
            F.asc_nulls_first("y"),
            F.asc_nulls_first("q"),
            F.asc_nulls_first("m"),
        )
    )


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, SUM(n) AS row_total FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.n,
           ROUND(CAST(t.n AS DOUBLE) / tot.row_total, 6) AS p
    FROM t JOIN tot USING (prev_type)
    ORDER BY t.prev_type, t.next_type
    """,
    doc="First-order Markov transition matrix of user behavior: lag() "
    "per user over (ts, event_id) — a total order, so every engine "
    "sees the same predecessor — then conditional transition "
    "probabilities from integer counts (one exact divide per output "
    "row). Scale: one shuffle on user_id for the lag, one "
    "map-side-combined count on the (prev, next) pair — the pair "
    "domain is |event_types|², metadata-sized regardless of fact "
    "volume.",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        t.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "p"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "customer_revenue_gini",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_c,
             row_number() OVER (ORDER BY rev_c, o_custkey) AS i
      FROM per_cust
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(rev_c) AS tot,
             SUM(CAST(i * rev_c AS DECIMAL(38,0))) AS weighted
      FROM ranked
    )
    SELECT n,
           CAST(tot AS DOUBLE) / 100.0 AS total_revenue,
           ROUND((2.0 * CAST(weighted AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
    doc="Revenue-concentration Gini coefficient over per-customer "
    "revenue: rank-weighted exact formula G = 2·Σ(i·x_i)/(n·Σx) - "
    "(n+1)/n. Each i·rev_c product fits BIGINT, but their SUM passes "
    "2^63 at sf10 (~5e18 — caught by the round-12 sf10 replay, the "
    "same failure class as gini_customer_revenue's r11 fix), so the "
    "rank-weighted sum accumulates in DECIMAL(38,0) on BOTH engines "
    "(internal only: the surfaced gini is one IEEE expression on the "
    "double cast, so the pandas-bridge DECIMAL caveat does not "
    "apply). Ties broken by customer key so the rank assignment — "
    "and therefore the "
    "bit-exact result — is engine-independent. Scale: the fact rollup "
    "shuffles once on custkey; the global sort ranks the CUSTOMER "
    "aggregate (dimension-sized), and the final reduce is one row.",
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("rev_c")
    )
    w = Window.orderBy("rev_c", "o_custkey")
    ranked = per_cust.select(
        "rev_c", F.row_number().over(w).alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_c").alias("tot"),
        F.sum(
            (F.col("i") * F.col("rev_c")).cast("decimal(38,0)")
        ).alias("weighted"),
    )
    return s.select(
        "n",
        (F.col("tot").cast("double") / 100.0).alias("total_revenue"),
        F.round(
            (2.0 * F.col("weighted").cast("double"))
            / (F.col("n").cast("double") * F.col("tot").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "salted_event_type_totals",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="The SALTED two-stage aggregation (operators.relational."
    "salted_agg) as a driver-verified query: stage 1 groups by "
    "(event_type, content-hash salt % 16) so a hot key spreads over 16 "
    "reducers, stage 2 re-aggregates the tiny partials by the real key. "
    "The oracle is the PLAIN GROUP BY — exact-integer sums are "
    "associative, so the salted plan must be bit-identical to the "
    "direct one, which is precisely the property that makes salting "
    "safe to deploy against a skewed 100 TB key. Counts ride along as "
    "a salted SUM of partial counts.",
)
def salted_event_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.relational import (
        salted_agg,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        cents("value").alias("v_c"),
        F.lit(1).cast("long").alias("one"),
    )
    totals = salted_agg(ev, ["event_type"], "v_c", salt_buckets=16)
    counts = salted_agg(ev, ["event_type"], "one", salt_buckets=16)
    return (
        totals.join(counts, "event_type")
        .select(
            "event_type",
            F.col("v_c").alias("total_c"),
            F.col("one").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "doc_length_quartiles_by_source",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           MAX(n) AS n_docs,
           MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN n_chars END) AS p25,
           MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN n_chars END) AS p50,
           MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN n_chars END) AS p75
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    doc="EXACT grouped quartiles (percentile_disc semantics) computed "
    "as rank arithmetic: row_number over a TOTAL per-group order "
    "(n_chars, doc_id) + a windowed count, then each quartile is the "
    "minimum value at-or-past ceil(p*n) — integer selection, no "
    "interpolation, so the result is bit-identical on any engine "
    "(interpolating percentile aggregates differ in FP merge order). "
    "Scale: ONE shuffle on the group key serves both window functions "
    "and the final aggregate (same partitioning); per-group state is "
    "a sort, the standard exact-quantile cost — approximate needs use "
    "the KLL/GK sketch profile instead (approx_event_profile).",
)
def doc_length_quartiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def q(p: float, name: str) -> F.Column:
        return F.min(
            F.when(F.col("rn") >= F.ceil(p * F.col("n")), F.col("n_chars"))
        ).alias(name)

    return (
        ranked.groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            q(0.25, "p25"),
            q(0.5, "p50"),
            q(0.75, "p75"),
        )
        .orderBy("source")
    )


@register(
    "events_in_prior_hour",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    c AS (
      SELECT user_id, event_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                            RANGE BETWEEN 3599999999 PRECEDING
                                      AND 1 PRECEDING) AS n_prior_hour
      FROM e
    )
    SELECT user_id, event_id, n_prior_hour
    FROM c
    ORDER BY n_prior_hour DESC, user_id ASC, event_id ASC
    LIMIT 20
    """,
    doc="Per-entity sliding interval frame (the rate-limit / burst-"
    "detection shape): for every event, how many of the SAME user's "
    "events fell in the preceding hour — a RANGE frame over exact epoch "
    "microseconds (integer bounds, identical on both engines; Spark's "
    "rangeBetween needs a numeric ordering key anyway, and epoch micros "
    "make the frame arithmetic exact rather than interval-typed). One "
    "shuffle on user_id; the frame is evaluated in a single per-"
    "partition pass. The streaming twin is a sliding window count "
    "(streaming/events.py); this is the batch/backfill form.",
)
def events_in_prior_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_599_999_999, -1)
    )
    return (
        ev.select("user_id", "event_id", us)
        .withColumn("n_prior_hour", F.count(F.lit(1)).over(w))
        .select("user_id", "event_id", "n_prior_hour")
        .orderBy(
            F.desc("n_prior_hour"), F.asc("user_id"), F.asc("event_id")
        )
        .limit(20)
    )


@register(
    "event_type_reconciliation",
    oracle="""
    WITH expected(event_type, category) AS (
      VALUES ('click', 'engage'), ('view', 'engage'),
             ('purchase', 'convert'), ('signup', 'convert'),
             ('refund', 'convert')
    ),
    actual AS (
      SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1
    )
    SELECT COALESCE(e.event_type, a.event_type) AS event_type,
           e.category,
           a.n_events,
           CASE WHEN e.event_type IS NULL THEN 'unexpected'
                WHEN a.event_type IS NULL THEN 'missing'
                ELSE 'ok' END AS status
    FROM expected e FULL OUTER JOIN actual a
      ON e.event_type = a.event_type
    ORDER BY event_type
    """,
    doc="FULL OUTER join — the reconciliation shape (completing the "
    "join-type surface: inner/left/semi/anti/range/as-of/interval/cross "
    "were already covered): an expected-taxonomy dimension against the "
    "observed event-type census, each side NULL-extending the other, "
    "with a three-way status verdict (ok / missing expected type / "
    "unexpected observed type — here 'refund' never occurs and 'error' "
    "is not in the taxonomy). Scale: the census aggregates the fact "
    "table map-side to |event_types| rows; the full outer join runs "
    "over two metadata-sized relations.",
)
def event_type_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    expected = spark.createDataFrame(
        [
            ("click", "engage"),
            ("view", "engage"),
            ("purchase", "convert"),
            ("signup", "convert"),
            ("refund", "convert"),
        ],
        ["event_type", "category"],
    )
    actual = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    e, a = expected.alias("e"), actual.alias("a")
    return (
        e.join(a, F.col("e.event_type") == F.col("a.event_type"), "full_outer")
        .select(
            F.coalesce(F.col("e.event_type"), F.col("a.event_type")).alias(
                "event_type"
            ),
            F.col("e.category").alias("category"),
            F.col("a.n_events").alias("n_events"),
            F.when(F.col("e.event_type").isNull(), F.lit("unexpected"))
            .when(F.col("a.event_type").isNull(), F.lit("missing"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
        .orderBy("event_type")
    )
