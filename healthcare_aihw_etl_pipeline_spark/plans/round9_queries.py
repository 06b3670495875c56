"""Round-9 query families: survival analysis (Kaplan-Meier), portable
bloom-filter semi-join pruning, differential-privacy noisy release,
4-bit-quantized ANN with asymmetric distance, position-based (U-shaped)
attribution, and seasonally-adjusted anomaly screening.

Same contract as every plans module: each query is idiomatic PySpark
(Catalyst built-ins, zero row-Python) paired with a DuckDB oracle whose
arithmetic is bit-identical — exact integer moments, quantized ln
contributions, correctly-rounded IEEE ops on identical expressions.
Reference lineage: these generalize the reference's filter→aggregate
analytics path (/root/reference/streamlit_app.py:78-152) to the
statistical / curation surface a warehouse engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.operators import privacy
from healthcare_aihw_etl_pipeline_spark.operators.portable_sketch import (
    BLOOM_K,
    bloom_build,
    bloom_position_sql,
    bloom_probe,
)
from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
    sq4_adc_dist2,
    sql_sq4_adc_dist2,
)
from healthcare_aihw_etl_pipeline_spark.plans.registry import (
    cents,
    register,
    sql_cents,
)
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

_LN_Q = 1_000_000_000  # billionth-quantized ln contributions
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Survival analysis


@register(
    "kaplan_meier_conversion",
    oracle=f"""
    WITH h AS (SELECT MAX(ts) AS horizon FROM events),
    s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.s_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    ),
    d AS (
      SELECT s.user_id,
             CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS evt,
             (epoch_us(COALESCE(p.p_ts, h.horizon)) - epoch_us(s.s_ts))
               // {_DAY_US} AS dur
      FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN h
    ),
    km AS (
      SELECT dur, CAST(SUM(evt) AS BIGINT) AS d_t,
             CAST(SUM(1 - evt) AS BIGINT) AS c_t
      FROM d GROUP BY dur
    ),
    w AS (
      SELECT dur, d_t, c_t,
             (SELECT COUNT(*) FROM d)
               - COALESCE(SUM(d_t + c_t) OVER (
                   ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_risk
      FROM km
    ),
    t AS (
      SELECT dur, n_risk, d_t, c_t,
             CASE WHEN d_t < n_risk THEN
               CAST(floor(ln(CAST(n_risk - d_t AS DOUBLE)
                             / CAST(n_risk AS DOUBLE)) * {_LN_Q} + 0.5)
                    AS BIGINT)
             ELSE NULL END AS term_q
      FROM w
    )
    SELECT dur AS duration_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           d_t AS n_events,
           c_t AS n_censored,
           CASE WHEN d_t = n_risk THEN NULL
                ELSE CAST(SUM(term_q) OVER (ORDER BY dur) AS BIGINT)
           END AS surv_lnq
    FROM t
    ORDER BY duration_day
    """,
    doc="Kaplan-Meier survival curve of signup->purchase conversion "
    "with right-censoring at the corpus horizon: per duration day, the "
    "risk set, event and censor counts, and ln S(t) as the cumulative "
    "sum of billionth-quantized ln((n-d)/n) terms — exact integer "
    "sums, so both engines agree bit-for-bit (ln on identical double "
    "inputs, the value_drift_psi discipline); S(t)=0 rows carry NULL "
    "(-inf). Scale: the event shuffle is one groupBy(user); the KM "
    "relation itself is |distinct durations| — calendar-bounded, not "
    "data-bounded — so the unpartitioned window costs nothing at any "
    "corpus size.",
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from healthcare_aihw_etl_pipeline_spark.operators.survival import (
        signup_purchase_durations,
    )

    # Shared duration relation (operators/survival.py): two fact scans
    # + the footer-statistics horizon.
    d = signup_purchase_durations(spark, sf_dir)
    return _km_surface(d)


def _km_surface(d: DataFrame) -> DataFrame:
    """The KM estimator over a (evt, dur) relation — shared by the
    from-scratch form and the silver-served twin (cannot drift)."""
    from pyspark.sql import Window

    km = d.groupBy("dur").agg(
        F.sum("evt").cast("long").alias("d_t"),
        F.sum(F.lit(1) - F.col("evt")).cast("long").alias("c_t"),
    )
    # n_risk from the bounded km relation itself (wall-window total -
    # exclusive prefix, the nelson_aalen identity): the old separate
    # `total` aggregate re-ran the ENTIRE duration pipeline a second
    # time just to fetch one scalar.
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = km.withColumn(
        "n_risk",
        F.sum(F.col("d_t") + F.col("c_t")).over(wall)
        - F.coalesce(F.sum(F.col("d_t") + F.col("c_t")).over(wcum), F.lit(0)),
    )
    term_q = F.when(
        F.col("d_t") < F.col("n_risk"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d_t")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(_LN_Q)
            + F.lit(0.5)
        ).cast("long"),
    )
    wsum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        w.withColumn("term_q", term_q)
        .select(
            F.col("dur").alias("duration_day"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_t").alias("n_events"),
            F.col("c_t").alias("n_censored"),
            F.when(
                F.col("d_t") == F.col("n_risk"), F.lit(None).cast("long")
            )
            .otherwise(F.sum("term_q").over(wsum).cast("long"))
            .alias("surv_lnq"),
        )
        .orderBy("duration_day")
    )


# ---------------------------------------------------------------------------
# Portable bloom-filter semi-join pruning


def _bloom_positions_sql(key: str) -> str:
    return (
        "["
        + ", ".join(bloom_position_sql(key, i) for i in range(BLOOM_K))
        + "]"
    )


@register(
    "bloom_prune_orders",
    oracle=f"""
    WITH bits AS (
      SELECT DISTINCT pos FROM (
        SELECT UNNEST({_bloom_positions_sql('c_custkey')}) AS pos
        FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      )
    ),
    probe AS (
      SELECT o_orderkey, o_custkey,
             UNNEST({_bloom_positions_sql('o_custkey')}) AS p
      FROM orders
    ),
    passed AS (
      SELECT o_orderkey, o_custkey
      FROM probe JOIN bits ON probe.p = bits.pos
      GROUP BY o_orderkey, o_custkey
      HAVING COUNT(*) = {BLOOM_K}
    ),
    exact AS (
      SELECT COUNT(*) AS n FROM orders o
      WHERE EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey
                      AND c.c_mktsegment = 'AUTOMOBILE')
    )
    SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
           (SELECT n FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM passed) AS n_bloom,
           CAST((SELECT COUNT(*) FROM passed) - (SELECT n FROM exact)
                AS BIGINT) AS false_pos,
           CAST(CASE WHEN (SELECT COUNT(*) FROM orders)
                          = (SELECT n FROM exact) THEN NULL
                ELSE ((SELECT COUNT(*) FROM passed) - (SELECT n FROM exact))
                     * 1000000
                     // ((SELECT COUNT(*) FROM orders) - (SELECT n FROM exact))
                END AS BIGINT) AS fpr_ppm
    FROM exact LIMIT 1
    """,
    doc="Portable bloom-filter semi-join pruning with false-positive "
    "accounting: the AUTOMOBILE-segment customer keys build a "
    "16384-bit / 4-hash md5 bloom (a distinct-positions relation, "
    "broadcastable at any build cardinality), the orders fact probes "
    "it, and the report compares bloom survivors to the exact "
    "semi-join — n_orders / n_exact / n_bloom / false_pos / fpr_ppm "
    "(exact integer ppm). At 100 TB this is the scan-pruning pattern "
    "that turns a shuffle semi-join into a broadcast bitset test; the "
    "md5 arithmetic replays bit-for-bit in the oracle, false "
    "positives included.",
)
def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build_keys = cust.where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    ).select("c_custkey")
    bits = bloom_build(build_keys, "c_custkey")
    probe = orders.select("o_orderkey", "o_custkey")
    n_bloom = bloom_probe(probe, "o_custkey", bits).agg(
        F.count(F.lit(1)).alias("n_bloom")
    )
    n_exact = (
        probe.join(build_keys, probe["o_custkey"] == build_keys["c_custkey"],
                   "left_semi")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    n_orders = probe.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        n_orders.crossJoin(n_exact)
        .crossJoin(n_bloom)
        .select(
            "n_orders",
            "n_exact",
            "n_bloom",
            (F.col("n_bloom") - F.col("n_exact")).alias("false_pos"),
            F.expr(
                "CAST(CASE WHEN n_orders = n_exact THEN NULL"
                " ELSE (n_bloom - n_exact) * 1000000"
                " div (n_orders - n_exact) END AS BIGINT)"
            ).alias("fpr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Differential-privacy noisy release

_DP_EPS = 0.5


@register(
    "dp_noised_priority_counts",
    oracle=f"""
    SELECT o_orderpriority,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon,
           CAST(COUNT(*) AS BIGINT) * {privacy.DP_Q}
             + {privacy.sql_laplace_noise_q(
                 "'dp:v1:' || o_orderpriority", _DP_EPS)}
             AS noisy_count_q
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Differentially-private release of order counts per priority: "
    "epsilon=0.5, sensitivity 1 (row-level DP), Laplace noise from the "
    "inverse CDF of a deterministic md5-uniform draw per release cell "
    "(seeded noise = reproducible pipelines; production one-shot "
    "releases swap in true randomness, same accounting). Output in "
    "exact micro-count quanta so the release replays bit-for-bit. "
    "One groupBy — the noise is O(|cells|), data-free.",
)
def dp_noised_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seed = F.concat(F.lit("dp:v1:"), F.col("o_orderpriority"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "o_orderpriority",
            F.lit(_DP_EPS).alias("epsilon"),
            (
                F.col("_n") * F.lit(privacy.DP_Q)
                + privacy.laplace_noise_q(seed, _DP_EPS)
            ).alias("noisy_count_q"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Compressed-vector ANN (SQ4 + asymmetric distance)


@register(
    "ann_sq4_adc_top10",
    oracle=f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
      SELECT e.vec_id,
             ROUND({sql_sq4_adc_dist2('e.embedding', 'q.qv')}, 6) AS d2
      FROM embeddings e, q
    )
    SELECT vec_id, d2 FROM scored
    ORDER BY d2 ASC, vec_id ASC LIMIT 10
    """,
    doc="ANN over 4-bit scalar-quantized vectors with asymmetric "
    "distance (full-precision query vs cell centers) — the "
    "vector-store compression pattern (8x vs float32; the grid "
    "codebook is the data-independent limit of product quantization, "
    "so the whole compressed search replays in the oracle). One scan "
    "+ TakeOrderedAndProject; ranked on 6dp-rounded distance (DuckDB "
    "list_sum is not a strict left fold — ~1 ulp drift).",
)
def ann_sq4_adc_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.plans.llm_queries import (
        _query_vector,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.round(
            sq4_adc_dist2("embedding", _query_vector(spark, sf_dir)), 6
        ).alias("d2"),
    )
    # ascending top-k: still TakeOrderedAndProject (per-partition heap)
    return scored.orderBy(F.asc("d2"), F.asc("vec_id")).limit(10)


# ---------------------------------------------------------------------------
# Position-based (U-shaped) attribution

_ATTR_HORIZON_US = 24 * 3600 * 1_000_000


@register(
    "u_shaped_attribution",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts, {sql_cents('value')} AS v_c
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS tid, user_id, ts, event_type
      FROM events WHERE event_type <> 'purchase'
    ),
    fanout AS (
      SELECT p.pid, p.v_c, t.tid, t.event_type AS channel, t.ts
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.ts <= p.ts
       AND epoch_us(p.ts) - epoch_us(t.ts) <= {_ATTR_HORIZON_US}
    ),
    pos AS (
      SELECT pid, v_c, channel,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts, tid) AS rn,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM fanout
    ),
    credits AS (
      SELECT channel,
             CAST(floor(CAST(v_c AS DOUBLE)
                  * CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 1
                         WHEN rn = 1 OR rn = n THEN 2 ELSE 1 END
                  / CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 2
                         WHEN rn = 1 OR rn = n THEN 5 ELSE 5 * (n - 2) END
                  * 10000 + 0.5) AS BIGINT) AS credit_q
      FROM pos
    ),
    direct AS (
      SELECT 'direct' AS channel,
             CAST(SUM(v_c) AS BIGINT) * 10000 AS credit_q,
             COUNT(*) AS n
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM fanout f WHERE f.pid = p.pid)
    )
    SELECT channel,
           COUNT(*) AS n_credits,
           CAST(SUM(credit_q) AS BIGINT) AS credited_q
    FROM credits
    GROUP BY channel
    UNION ALL
    SELECT channel, n, credit_q FROM direct WHERE n > 0
    ORDER BY channel
    """,
    doc="Position-based (U-shaped 40/20/40) multi-touch attribution: "
    "within each purchase's 24h journey ordered by (ts, touch id), "
    "first and last touches earn 40% each and the middle splits 20% "
    "equally (n=1 -> 100%, n=2 -> 50/50). Credits are exact rationals "
    "v_c * num/den quantized to hundredth-cents in one identical "
    "mul-div IEEE expression per row. Journey positions come from one "
    "window over the horizon-bounded fan-out — same one-shuffle shape "
    "as the decay form, different business rule.",
)
def u_shaped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        "ts",
        cents("value").alias("v_c"),
    )
    touches = ev.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    age_us = F.expr("timestampdiff(MICROSECOND, t_ts, ts)")
    fanout = (
        purchases.join(touches, "user_id")
        .where(
            (F.col("t_ts") <= F.col("ts"))
            & (age_us <= F.lit(_ATTR_HORIZON_US))
        )
        .select(
            "pid", "v_c", "tid", F.col("event_type").alias("channel"),
            "t_ts",
        )
    )
    wseq = Window.partitionBy("pid").orderBy("t_ts", "tid")
    wcnt = Window.partitionBy("pid")
    num = (
        F.when(F.col("n") <= 2, F.lit(1))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(2))
        .otherwise(F.lit(1))
    )
    den = (
        F.when(F.col("n") == 1, F.lit(1))
        .when(F.col("n") == 2, F.lit(2))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(5))
        .otherwise(F.lit(5) * (F.col("n") - 2))
    )
    credit_q = F.floor(
        F.col("v_c").cast("double")
        * num.cast("double")
        / den.cast("double")
        * F.lit(10_000)
        + F.lit(0.5)
    ).cast("long")
    credits = (
        fanout.withColumn("rn", F.row_number().over(wseq))
        .withColumn("n", F.count(F.lit(1)).over(wcnt))
        .select("channel", credit_q.alias("credit_q"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit_q").cast("long").alias("credited_q"),
        )
    )
    direct = (
        purchases.join(fanout.select("pid").distinct(), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            (F.sum("v_c").cast("long") * F.lit(10_000)).alias("credited_q"),
        )
        .where(F.col("n_credits") > 0)
        .select(F.lit("direct").alias("channel"), "n_credits", "credited_q")
    )
    return credits.unionByName(direct).orderBy("channel")


# ---------------------------------------------------------------------------
# Seasonally-adjusted anomaly screen


@register(
    "dow_adjusted_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             isodow(o_orderdate) AS dow,
             CAST(SUM({sql_cents('o_totalprice')}) // 100000 AS BIGINT)
               AS rev_k
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT dow, COUNT(*) AS n,
             CAST(SUM(rev_k) AS BIGINT) AS s1,
             CAST(SUM(rev_k * rev_k) AS BIGINT) AS s2
      FROM daily GROUP BY dow
    )
    SELECT strftime(daily.d, '%Y-%m-%d') AS day, daily.dow AS dow,
           rev_k AS revenue_kdollars,
           CAST(floor(
             CAST(n * rev_k - s1 AS DOUBLE)
             / sqrt(CAST(n AS DOUBLE)
                    * CAST(n * s2 - s1 * s1 AS DOUBLE))
             * 1000 + 0.5) AS BIGINT) AS z_milli,
           abs(CAST(n * rev_k - s1 AS DOUBLE))
             > 3.0 * sqrt(CAST(n AS DOUBLE)
                          * CAST(n * s2 - s1 * s1 AS DOUBLE))
             AS anomaly
    FROM daily JOIN m ON daily.dow = m.dow
    WHERE n > 1
    ORDER BY day
    """,
    doc="Seasonally-adjusted anomaly screen: daily revenue z-scored "
    "against its OWN ISO day-of-week population (a Monday is compared "
    "to Mondays), so weekly seasonality cannot masquerade as an "
    "anomaly. Moments are exact BIGINTs at kilodollar scale — the "
    "round-12 sf10 replay caught the whole-dollar grain overflowing "
    "SUM(rev^2) past 2^63 (TPC-H daily revenue is ~1e9 dollars at "
    "sf10), so the grain is $1000 units on both engines, good through "
    "~sf3000; the z itself is one "
    "correctly-rounded IEEE divide+sqrt on identical inputs, "
    "milli-quantized — bit-stable where stddev_samp's float "
    "partial-merge order is not. One groupBy(day) shuffle; the dow "
    "moment table is 7 rows, broadcast back.",
)
def dow_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            # Spark weekday() is 0=Monday; +1 == DuckDB isodow()
            (F.weekday("o_orderdate") + F.lit(1)).cast("long").alias("dow"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("_rev_c"))
        .withColumn("rev_k", F.expr("_rev_c div 100000").cast("long"))
        .drop("_rev_c")
    )
    m = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_k").cast("long").alias("s1"),
        F.sum(F.col("rev_k") * F.col("rev_k")).cast("long").alias("s2"),
    )
    dev = (F.col("n") * F.col("rev_k") - F.col("s1")).cast("double")
    scale = F.sqrt(
        F.col("n").cast("double")
        * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
    )
    return (
        daily.join(F.broadcast(m), "dow")
        .where(F.col("n") > 1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            F.col("rev_k").alias("revenue_kdollars"),
            F.floor(dev / scale * F.lit(1000) + F.lit(0.5))
            .cast("long")
            .alias("z_milli"),
            (F.abs(dev) > F.lit(3.0) * scale).alias("anomaly"),
        )
        .orderBy("day")
    )
