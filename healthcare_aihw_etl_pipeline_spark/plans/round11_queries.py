"""Round-11 query families: order-statistics and resampling shapes a
large analytics engine needs beyond plain aggregation — Pareto-skyline
extraction (two-phase, partition-local pruning before a bounded global
pass), sweep-line interval analytics (concurrency peaks, union
coverage, concurrency integral), largest-remainder integer
apportionment, deterministic Poisson-bootstrap inference, a
two-iteration Lloyd k-means refinement over the embedding table with
bit-exact cross-engine parity, golden-record entity-resolution
survivorship, and per-day time-weighted averages (TWAP).

Same contract as every plans module: idiomatic PySpark paired with a
DuckDB oracle whose arithmetic is bit-identical — exact integer cents,
quantization before any cross-row float sum, single IEEE ops on
identical literal expressions. Reference lineage: the reference
(/root/reference/main.py) computes ranked/percentage views of grouped
admissions; these queries extend the same grouped-analytics surface to
the order-statistics/resampling family at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans.registry import (
    cents,
    register,
    sql_cents,
)
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# Pareto skyline (two-phase)

# Bucket width for the partition-local skyline phase, in epoch days.
# Any grouping works (dominance is transitive, so a locally-dominated
# point is also globally dominated); ~quarterly buckets keep each local
# window far under executor memory at any SF.
_SKY_BUCKET_DAYS = 96


@register(
    "skyline_orders",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS order_day,
             {sql_cents('o_totalprice')} AS price_c
      FROM orders
    ),
    loc AS (
      SELECT *,
             MAX(price_c) OVER (
               PARTITION BY order_day // {_SKY_BUCKET_DAYS}
               ORDER BY order_day
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS before_max,
             MAX(price_c) OVER (
               PARTITION BY order_day // {_SKY_BUCKET_DAYS}, order_day
             ) AS day_max
      FROM pts
    ),
    surv AS (
      SELECT o_orderkey, order_day, price_c FROM loc
      WHERE (before_max IS NULL OR before_max < price_c)
        AND price_c = day_max
    ),
    gpass AS (
      SELECT *,
             MAX(price_c) OVER (
               ORDER BY order_day
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS before_max,
             MAX(price_c) OVER (PARTITION BY order_day) AS day_max
      FROM surv
    )
    SELECT o_orderkey, order_day, price_c
    FROM gpass
    WHERE (before_max IS NULL OR before_max < price_c)
      AND price_c = day_max
    ORDER BY order_day
    """,
    doc="Pareto skyline of orders (earliest date, highest price): every "
    "order not dominated by another that is no later AND no cheaper "
    "(strictly better on at least one axis). Two-phase plan — the only "
    "shape that survives 100 TB: phase 1 computes bucket-local skylines "
    "with a per-bucket running-max window (dominance is transitive, so "
    "anything locally dominated is globally dominated and partitions "
    "never need to see each other's raw rows); phase 2 re-runs the same "
    "running-max over the survivors only — expected O(log n) per bucket "
    "for unordered data, so the global window's input is tiny. Exact "
    "integer cents make every comparison engine-identical; equal "
    "(day, price) duplicates are mutually non-dominating and both kept "
    "(the day_max equality keeps ties, the strict before_max keeps "
    "cross-day semantics).",
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("order_day"),
        cents("o_totalprice").alias("price_c"),
    )

    def skyline_pass(df: DataFrame, *bucket_cols) -> DataFrame:
        w_before = (
            Window.partitionBy(*bucket_cols)
            .orderBy("order_day")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_day = Window.partitionBy(*bucket_cols, "order_day")
        return (
            df.withColumn("before_max", F.max("price_c").over(w_before))
            .withColumn("day_max", F.max("price_c").over(w_day))
            .where(
                (F.col("before_max").isNull()
                 | (F.col("before_max") < F.col("price_c")))
                & (F.col("price_c") == F.col("day_max"))
            )
            .select("o_orderkey", "order_day", "price_c")
        )

    local = skyline_pass(
        pts.withColumn(
            "bucket", F.floor(F.col("order_day") / _SKY_BUCKET_DAYS)
        ),
        "bucket",
    )
    return skyline_pass(local).orderBy("order_day")


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency


@register(
    "max_concurrent_sessions",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    deltas AS (
      SELECT day, s AS t, CAST(1 AS BIGINT) AS d FROM iv
      UNION ALL
      SELECT day, e AS t, CAST(-1 AS BIGINT) AS d FROM iv
    ),
    run AS (
      SELECT day, d,
             SUM(d) OVER (
               PARTITION BY day ORDER BY t, d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS running
      FROM deltas
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions,
           CAST(MAX(running) AS BIGINT) AS max_concurrent
    FROM run GROUP BY day ORDER BY day
    """,
    doc="Sweep-line interval concurrency: per-user daily activity "
    "spans [first event, last event] become +1/-1 boundary deltas; a "
    "running prefix sum ordered by (time, +1 before -1 — closed "
    "intervals: a span ending at t and one starting at t ARE "
    "concurrent) gives the active-session count at every boundary, and "
    "its per-day max is the day's peak concurrency. Scale shape: "
    "intervals never span days by construction, so the sweep partitions "
    "exactly by day — no global sort, no single-partition window, and "
    "the per-day prefix sum is the textbook parallel sweep-line. Tie "
    "blocks of identical (t, d) rows produce consecutive running "
    "values whose MAX is permutation-invariant, so the window is "
    "deterministic cross-engine even where row order within ties is "
    "not.",
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan pipeline: the union-of-two-selects form recomputed the
    # interval aggregate per branch (three events scans, three fact-grain
    # shuffles — Spark does not CSE across union branches); exploding
    # each interval into its two boundary deltas map-side keeps one
    # scan, one (user, day) shuffle, one (day) window shuffle. Round 12
    # factored the boundary-delta pipeline into operators.sweep, shared
    # with interval_union_coverage and the fused interval_sweep_profile
    # (ordering by exact integer µs ≡ ordering by the timestamp, and t
    # itself is not an output, so the result is bit-identical).
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        daily_boundary_segments,
        max_concurrent_from_segments,
    )

    from healthcare_aihw_etl_pipeline_spark.sources.catalog import table_rows

    ev = load_table(spark, sf_dir, "events")
    return max_concurrent_from_segments(
        daily_boundary_segments(ev, table_rows(sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# Largest-remainder integer apportionment

_ALLOC_SEATS = 10_000


@register(
    "largest_remainder_allocation",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name, SUM({sql_cents('o.o_totalprice')}) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(rev_c) AS t FROM rev),
    q AS (
      SELECT n_name, rev_c,
             ({_ALLOC_SEATS} * rev_c) // t AS floor_alloc,
             ({_ALLOC_SEATS} * rev_c) % t AS remainder
      FROM rev, tot
    ),
    lo AS (SELECT {_ALLOC_SEATS} - SUM(floor_alloc) AS leftover FROM q),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY remainder DESC, n_name ASC) AS rk
      FROM q
    )
    SELECT n_name, CAST(floor_alloc AS BIGINT) AS floor_alloc,
           CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS final_alloc
    FROM ranked, lo
    ORDER BY n_name
    """,
    doc="Largest-remainder (Hamilton) apportionment of a fixed "
    f"{_ALLOC_SEATS}-seat budget across nations proportional to exact "
    "order revenue: integer floor quotas, then one seat each to the "
    "largest remainders (name tiebreak) until the budget is exact — "
    "sum(final_alloc) == budget by construction, no floating point "
    "anywhere. Scale shape: one groupBy to the 25-row nation grain "
    "(broadcast dim joins), a 1-row total crossJoin, and a window over "
    "the dimension-bounded aggregate — the fact table is touched once. "
    "Overflow bound: seats x total cents stays under 2^63 through "
    "~sf10 (2e18); widen to decimal(38,0) on BOTH engines beyond that.",
)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    )
    tot = rev.agg(F.sum("rev_c").alias("t"))
    q = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "rev_c",
        F.expr(f"({_ALLOC_SEATS} * rev_c) div t").alias("floor_alloc"),
        F.expr(f"({_ALLOC_SEATS} * rev_c) % t").alias("remainder"),
    )
    lo = q.agg((F.lit(_ALLOC_SEATS) - F.sum("floor_alloc")).alias("leftover"))
    ranked = q.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("remainder").desc(), F.col("n_name").asc())
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(lo))
        .select(
            "n_name",
            "floor_alloc",
            (
                F.col("floor_alloc")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("final_alloc"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap

_BOOT_B = 32
# Cumulative Poisson(1) CDF, P(X <= k) for k = 0..6; u above the last
# threshold draws weight 7 (P ~ 8e-5 — the tail truncation changes a
# replica's weight sum by <0.01%, identically in both engines). The
# literals are repr() of the exact doubles, spliced into BOTH engines'
# expressions so the parsed constants are bit-identical.
_POISSON_CDF = [
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712",
]
_POISSON_CASE = (
    "CASE "
    + " ".join(
        f"WHEN u <= {c} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    + " ELSE 7 END"
)

# Batched entropy: 4 md5 digests per ORDER yield 32 x 16-bit uniforms
# (8 hex-chunk draws per digest) — 8x fewer hash invocations than one
# md5 per (order, replica), which dominates the map-side cost at scale
# (measured 21.5 s -> see BASELINE round-11 at sf10). A 16-bit
# inverse-CDF draw quantizes the Poisson probabilities by < 2e-5,
# identically in both engines (u = (chunk+1)/65536 in (0, 1]).
_BOOT_DIGESTS = _BOOT_B // 8
_U16_DIV = "65536.0"


def _digest_pick(div_op: str) -> str:
    whens = " ".join(
        f"WHEN {j} THEN h{j}" for j in range(_BOOT_DIGESTS - 1)
    )
    return (
        f"CASE b {div_op} 8 {whens} ELSE h{_BOOT_DIGESTS - 1} END"
    )


# DuckDB oracle keeps the legible row-per-draw form: '0x' || hex cast,
# u = (chunk+1)/65536 in (0, 1], CDF CASE on the double.
_DUCK_U16 = (
    f"(CAST(CAST('0x' || substring({_digest_pick('//')},"
    f" (b % 8) * 4 + 1, 4) AS BIGINT) + 1 AS DOUBLE)) / {_U16_DIV}"
)

# Spark evaluates the SAME draws without materializing a row per draw:
# u <= t  ⟺  chunk + 1 <= floor(t * 65536) (the scaled thresholds are
# never integers), so the weight is an integer CASE on a shifted/masked
# 32-bit parse of the digest — and each replica becomes one aggregate
# expression pair instead of an exploded row. 15M orders x 32 draws is
# 480M rows the old explode shape copied through the pipeline; the
# wide-aggregate shape touches each order once and keeps 64 sum slots
# (measured 8.4 s -> 3.0 s at sf1).
_U16_THRESH = [
    int(__import__("math").floor(float(t) * 65536)) for t in _POISSON_CDF
]


def _w_int_expr(b: int) -> str:
    """Integer-CASE Poisson weight for replica b over parsed digest
    words p{j}_{p} (32-bit big-endian hex parses, 2 chunks each)."""
    j, k = b // 8, b % 8
    p, half = k // 2, k % 2
    c = f"(shiftright(p{j}_{p}, {16 * (1 - half)}) & 65535)"
    cases = " ".join(
        f"WHEN {c} + 1 <= {t} THEN {i}" for i, t in enumerate(_U16_THRESH)
    )
    return f"CASE {cases} ELSE 7 END"


@register(
    "poisson_bootstrap_order_value",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, {sql_cents('o_totalprice')} AS price_c,
             {", ".join(
                 f"md5(CAST(o_orderkey AS VARCHAR) || ':{j}') AS h{j}"
                 for j in range(_BOOT_DIGESTS)
             )}
      FROM orders
    ),
    rep AS (
      SELECT o.price_c, g.b, {_DUCK_U16} AS u
      FROM o, unnest(generate_series(0, {_BOOT_B - 1})) AS g(b)
    ),
    per AS (
      SELECT b,
             SUM(CAST({_POISSON_CASE} AS BIGINT) * price_c) AS s1,
             SUM(CAST({_POISSON_CASE} AS BIGINT)) AS s0
      FROM rep GROUP BY b
    ),
    means AS (SELECT CAST(s1 // s0 AS BIGINT) AS q FROM per),
    stats AS (
      SELECT COUNT(*) AS n, SUM(q) AS sq, SUM(q * q) AS sqq FROM means
    ),
    base AS (
      SELECT COUNT(*) AS n_orders, SUM(price_c) AS total_c FROM o
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n AS BIGINT) AS n_replicas,
           CAST((total_c * 1000) // n_orders AS BIGINT) AS mean_millicents,
           CAST(floor(sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                           / ({_BOOT_B} * {_BOOT_B - 1}))
                      * 100 + 0.5) AS BIGINT) AS boot_se_centicents
    FROM base, stats
    """,
    doc=f"Deterministic Poisson bootstrap ({_BOOT_B} replicas) of the "
    "mean order value: each (order, replica) draws a Poisson(1) "
    "resampling weight by inverting the CDF at a deterministic "
    "uniform — the distributed-bootstrap standard (resampling "
    "n-out-of-n needs global coordination; independent Poisson counts "
    "need none and converge to the same distribution), here made "
    "bit-reproducible so the DuckDB oracle replays every draw. "
    f"Entropy is batched: {_BOOT_DIGESTS} md5 digests per ORDER yield "
    f"{_BOOT_B} 16-bit chunk uniforms (8x fewer hash calls than one "
    "digest per draw — the map-side cost at scale; 16-bit CDF "
    "inversion shifts Poisson probabilities < 2e-5, identically in "
    "both engines). Replica means are "
    "quantized to integer cents BEFORE the cross-replica variance "
    "(the only cross-row float risk), and the variance itself is "
    "exact-integer (n*sumsq - sum^2). Scale shape: NO row-per-draw "
    "explode — each replica is one aggregate-expression pair over an "
    "integer CASE (u <= t rewritten as chunk+1 <= floor(t*65536), "
    "exactly equivalent), so the fact table is touched once and the "
    "shuffle carries 64 sum slots per partition; the per-replica "
    "relation is reconstituted with stack() from one wide row "
    "(8.4 s -> 3.0 s at sf1 vs the exploded form). Per-replica sums "
    "are associative longs and the final stats run on a 32-row "
    "relation. Overflow: q is a replica MEAN in cents — "
    "scale-invariant — so n*sumsq stays ~1e17 at any SF.",
)
def poisson_bootstrap_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("price_c")
    )
    digests = o.select(
        "price_c",
        *[
            F.md5(
                F.concat_ws(":", F.col("o_orderkey"), F.lit(j))
            ).alias(f"h{j}")
            for j in range(_BOOT_DIGESTS)
        ],
    )
    parsed = digests.select(
        "price_c",
        *[
            F.expr(
                f"CAST(conv(substring(h{j}, {p * 8 + 1}, 8), 16, 10)"
                " AS BIGINT)"
            ).alias(f"p{j}_{p}")
            for j in range(_BOOT_DIGESTS)
            for p in range(4)
        ],
    )
    wide = parsed.agg(
        *[
            expr
            for b in range(_BOOT_B)
            for expr in (
                F.expr(
                    f"SUM(CAST(({_w_int_expr(b)}) AS BIGINT) * price_c)"
                ).alias(f"s1_{b}"),
                F.expr(
                    f"SUM(CAST(({_w_int_expr(b)}) AS BIGINT))"
                ).alias(f"s0_{b}"),
            )
        ]
    )
    stack_args = ", ".join(
        f"{b}, s1_{b}, s0_{b}" for b in range(_BOOT_B)
    )
    per = wide.selectExpr(
        f"stack({_BOOT_B}, {stack_args}) AS (b, s1, s0)"
    )
    means = per.select(F.expr("s1 div s0").cast("long").alias("q"))
    stats = means.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    base = o.agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("price_c").alias("total_c")
    )
    return base.crossJoin(F.broadcast(stats)).select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n").cast("long").alias("n_replicas"),
        F.expr("(total_c * 1000) div n_orders")
        .cast("long")
        .alias("mean_millicents"),
        F.floor(
            F.sqrt(
                (F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq"))
                .cast("double")
                / F.lit(float(_BOOT_B * (_BOOT_B - 1)))
            )
            * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("boot_se_centicents"),
    )


# ---------------------------------------------------------------------------
# Two-iteration Lloyd k-means refinement (exact cross-engine parity)

_KM_K = 8
_KM_DIMS = 64
_KM_Q = 1_048_576  # 2^20 coordinate quantizer for centroid means
_KM_DQ = "1000000000.0"  # per-term distance quantizer (1e9), literal text


def _km_dlit(x: float) -> str:
    """SQL double literal for a centroid coordinate. Finite values use
    the shortest-round-trip `{x!r}D` form (Catalyst parses back the
    bit-identical double); non-finite values (degenerate embedding
    rows) have no `...D` literal form — repr would emit unparseable
    'nanD'/'infD' — so they render as CAST literals, preserving the
    numeric behavior of the join-based plan (r16 ADVICE)."""
    import math

    if math.isfinite(x):
        return f"{x!r}D"
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"


def _sql_dist_q(a: str, b: str) -> str:
    """Quantized squared L2 distance between two double lists — every
    per-dimension term is floored to an integer BEFORE the sum, so the
    fold order of list_sum cannot matter."""
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), p -> "
        f"CAST(floor((p[1] - p[2]) * (p[1] - p[2]) * {_KM_DQ} + 0.5) "
        f"AS BIGINT))) AS BIGINT)"
    )


def _km_dist_q(a, b):
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, c: F.floor((x - c) * (x - c) * F.expr(_KM_DQ) + F.lit(0.5)).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register(
    "kmeans_refine_clusters",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cluster, ev AS cv FROM v WHERE vec_id < {_KM_K}
    ),
    d1 AS (
      SELECT v.vec_id, v.ev, c0.cluster,
             {_sql_dist_q('v.ev', 'c0.cv')} AS dq
      FROM v, c0
    ),
    a1 AS (
      SELECT vec_id, ev, cluster FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY dq, cluster) AS rn FROM d1
      ) WHERE rn = 1
    ),
    m1 AS (
      SELECT cluster, g.dim,
             (CAST(SUM(CAST(floor(ev[g.dim] * {_KM_Q} + 0.5) AS BIGINT))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {_KM_Q}.0 AS cm
      FROM a1, unnest(generate_series(1, {_KM_DIMS})) AS g(dim)
      GROUP BY cluster, g.dim
    ),
    c1 AS (
      SELECT cluster, list(cm ORDER BY dim) AS cv FROM m1 GROUP BY cluster
    ),
    d2 AS (
      SELECT v.vec_id, c1.cluster,
             {_sql_dist_q('v.ev', 'c1.cv')} AS dq
      FROM v, c1
    ),
    a2 AS (
      SELECT vec_id, cluster, dq FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY dq, cluster) AS rn FROM d2
      ) WHERE rn = 1
    ),
    norms AS (
      SELECT cluster,
             CAST(SUM(CAST(floor(cm * cm * {_KM_DQ} + 0.5) AS BIGINT))
                  AS BIGINT) AS centroid_norm2_q
      FROM m1 GROUP BY cluster
    )
    SELECT a2.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(a2.dq) AS BIGINT) AS inertia_q,
           MIN(norms.centroid_norm2_q) AS centroid_norm2_q
    FROM a2 JOIN norms ON norms.cluster = a2.cluster
    GROUP BY a2.cluster
    ORDER BY a2.cluster
    """,
    doc=f"Two Lloyd iterations of k-means (k={_KM_K}) over the "
    "embedding table with bit-exact cross-engine parity — the "
    "iterative-ML shape (assign, re-center, re-assign) expressed as "
    "pure relational algebra: seeds are the first k vectors, every "
    "squared-distance term is floor-quantized to an integer BEFORE "
    "its sum (fold order cannot matter, and the argmin compares "
    "integers — no float tie risk), and re-centered coordinates are "
    "exact-integer dimension sums divided in a fixed two-step IEEE "
    "sequence. Scale shape: centroids are a k-row broadcast on both "
    "assignment passes (no shuffle on the vector table), the "
    "re-centering is a posexplode to (cluster, dim) grain folded by "
    "map-side partial aggregation into k*d rows, and the argmin is an "
    "associative min-of-struct aggregate, not a window sort. Inertia "
    "is an exact integer sum (quantizer bound: ~1e12/vector — coarsen "
    "the quantizer or report per-cluster means beyond ~1e6 vectors "
    "per cluster).",
)
def kmeans_refine_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        _as_double_array,
    )

    from healthcare_aihw_etl_pipeline_spark.operators.layout import (
        ensure_min_splits,
    )

    # ensure_min_splits: the interpreted zip_with distance pass is the
    # per-row cost (HOFs are CodegenFallback), and an under-split
    # embeddings scan (1-2 parquet splits at bench SFs) serialized the
    # n*k*d lambda evals on 1-2 of 32 cores — a no-op on any
    # well-split cluster scan.
    v = ensure_min_splits(
        load_table(spark, sf_dir, "embeddings")
    ).select("vec_id", _as_double_array("embedding").alias("ev"))

    # ROUND 16 (optimization): the centroid relation is k rows (k=8) —
    # bounded — yet each assignment pass was a crossJoin (n*k rows,
    # each carrying the FULL 64-double embedding) followed by a
    # groupBy(vec_id) argmin whose shuffle shipped every embedding
    # payload (F.first("ev")) across the exchange: guide §2.3's
    # "shuffle keys, not payloads" anti-pattern, 2x. Centroids are now
    # COLLECTED (k rows / k*d means — the bounded-collect discipline)
    # and each assignment is a row-local argmin over a k-struct array
    # literal: array_min(array(struct(dq, cluster)...)) uses the same
    # (dq, cluster) struct ordering as the previous min(struct(...))
    # aggregate, and the per-term floor-quantized distance expression
    # is UNCHANGED — so assignments are bit-identical. Plan: 5
    # Exchanges (2 payload-carrying) -> 2 Exchanges (both k*d-sized
    # partial-agg outputs). Measured 1.35 -> 0.53 s at sf0.1, and the
    # shuffle no longer scales with vector count x k.
    def assign_local(cents: list[tuple[int, list[float]]]) -> DataFrame:
        """argmin cluster per vector, row-local over literal centroids.

        The whole argmin is ONE F.expr SQL string: building k*d double
        literals as nested py4j Column calls costs ~1.5 s of driver
        round-trips PER construction (measured — it dominated the
        fresh-build wall); one text parse is milliseconds. `{x!r}D`
        double literals are shortest-round-trip decimals, so Catalyst
        parses back the bit-identical double; the zip_with/aggregate
        distance text is the SQL form of _km_dist_q (same functions,
        same quantizer literal). Non-finite centroid coordinates
        (degenerate embedding rows) have no `...D` literal form —
        repr would emit unparseable 'nanD'/'infD' — so they render as
        the CAST('NaN'/'Infinity' AS DOUBLE) literals, preserving the
        numeric behavior of the previous join-based plan (r16
        ADVICE)."""
        parts = []
        for cl, cv in cents:
            arr = ", ".join(_km_dlit(float(x)) for x in cv)
            dist = (
                f"aggregate(zip_with(ev, array({arr}), (x, c) -> "
                f"CAST(floor((x - c) * (x - c) * {_KM_DQ} + 0.5) "
                "AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            )
            parts.append(
                f"struct({dist} AS dq, CAST({int(cl)} AS BIGINT)"
                " AS cluster)"
            )
        m = F.expr(f"array_min(array({', '.join(parts)}))")
        return v.select(
            "vec_id",
            "ev",
            m["cluster"].alias("cluster"),
            m["dq"].alias("dq"),
        )

    _empty = (
        "cluster long, n_members long, inertia_q long, "
        "centroid_norm2_q long"
    )
    c0 = sorted(
        (int(r["cluster"]), list(r["cv"]))
        for r in v.where(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cluster"), F.col("ev").alias("cv"))
        .collect()
    )
    if not c0:
        return spark.createDataFrame([], _empty)
    a1 = assign_local(c0)
    m1 = (
        a1.select("cluster", F.posexplode("ev").alias("pos", "x"))
        .groupBy("cluster", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(
                    F.floor(F.col("x") * _KM_Q + F.lit(0.5)).cast("long")
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(_KM_Q))
            ).alias("cm")
        )
    )
    m1_rows = m1.collect()  # k*d rows — bounded by k and dims
    if not m1_rows:
        return spark.createDataFrame([], _empty)
    by_cl: dict[int, list[tuple[int, float]]] = {}
    for r in m1_rows:
        by_cl.setdefault(int(r["cluster"]), []).append(
            (int(r["dim"]), float(r["cm"]))
        )
    c1 = sorted(
        (cl, [cm for _, cm in sorted(dims)]) for cl, dims in by_cl.items()
    )
    # centroid norms replicate the previous Spark expression exactly:
    # sum over dims of floor(cm*cm*1e9 + 0.5) as long (IEEE mul order
    # (cm*cm)*Q, floor = math.floor on a Python float/double)
    norm_q = {
        cl: sum(
            int(math.floor(cm * cm * float(_KM_DQ) + 0.5)) for cm in cv
        )
        for cl, cv in c1
    }
    a2 = assign_local(c1)
    norm_expr = F.create_map(
        *[
            x
            for cl in norm_q
            for x in (F.lit(int(cl)).cast("long"), F.lit(norm_q[cl]))
        ]
    )
    return (
        a2.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("dq").cast("long").alias("inertia_q"),
        )
        .select(
            "cluster",
            "n_members",
            "inertia_q",
            norm_expr[F.col("cluster")].alias("centroid_norm2_q"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: golden-record survivorship

_GR_TOPK = 20


def _symmetric_delete_edges(cust: DataFrame) -> DataFrame:
    """Exact lev<=1 match edges via symmetric-delete blocking.

    Each name emits itself plus every single-character deletion as
    block variants; two names at edit distance <= 1 necessarily share
    a variant (substitution: both delete the differing position;
    insertion/deletion: the longer's deletion equals the shorter
    intact), so the (nation, variant) equi-join candidate set is
    complete and the levenshtein check only VERIFIES. Returns distinct
    (src, dst) with src < dst."""
    variants = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("c_name")),
                    F.expr(
                        "transform(sequence(1, length(c_name)), i -> "
                        "concat(substr(c_name, 1, i - 1), "
                        "substr(c_name, i + 1)))"
                    ),
                )
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .select(
            F.col("a.c_custkey").alias("src"),
            F.col("b.c_custkey").alias("dst"),
        )
        .distinct()
    )


@register(
    "golden_record_customers",
    oracle="""
    WITH e AS (
      SELECT a.c_custkey AS src, b.c_custkey AS dst
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND levenshtein(a.c_name, b.c_name) <= 1
       AND a.c_custkey < b.c_custkey
    ),
    sym AS (
      SELECT src AS a, b FROM (SELECT src, dst AS b FROM e)
      UNION
      SELECT dst, src FROM e
    ),
    cc AS (
      WITH RECURSIVE reach(node, comp) AS (
        SELECT DISTINCT a, a FROM sym
        UNION
        SELECT s.a, reach.comp FROM sym s JOIN reach ON reach.node = s.b
      )
      SELECT node, MIN(comp) AS component FROM reach GROUP BY node
    ),
    assigned AS (
      SELECT c.*, COALESCE(cc.component, c.c_custkey) AS component
      FROM customer c LEFT JOIN cc ON cc.node = c.c_custkey
    ),
    golden AS (
      SELECT component,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             MIN(c_custkey) AS golden_id,
             MIN(c_name) AS golden_name,
             CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT))
                  AS BIGINT) AS best_acctbal_c,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
      FROM assigned GROUP BY component
    )
    SELECT golden_id, golden_name, n_members, best_acctbal_c, n_segments
    FROM golden
    ORDER BY n_members DESC, golden_id ASC
    LIMIT 20
    """,
    doc="Entity resolution end to end — the master-data golden-record "
    "pipeline: EXACT edit-distance-1 candidate generation by "
    "symmetric-delete blocking (SymSpell/FastSS: each name emits "
    "itself plus its length single-character deletions as block "
    "variants; any lev<=1 pair — substitution, insertion or deletion "
    "— shares at least one (nation, variant) block, so the equi-join "
    "candidate set is COMPLETE, unlike heuristic prefix blocks), "
    "levenshtein-verified, then transitive closure into entities "
    "(operators/dedup.connected_components — bounded driver "
    "union-find under the small-edge cap, pointer-jumping loop above "
    "it), then field-level survivorship per entity: min id and name, "
    "max exact-cents balance, segment spread. Singletons (no match "
    "edge) survive as their own entity via the left join + coalesce. "
    "Top-20 by entity size under a total (size, id) order keeps the "
    "output deterministic. Scale shape: the variant fan-out is ~|name| "
    "rows per record, the self-join is an equi-shuffle on the variant "
    "key with near-unit bucket sizes — linear where the nation-block "
    "theta-join the oracle uses for clarity is quadratic per block. "
    "The DuckDB oracle replays the closure with a recursive CTE — "
    "same min-reachable-id fixpoint; edge-set equality between the "
    "two candidate strategies is pinned by test.",
)
def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    cust = load_table(spark, sf_dir, "customer")
    # Exact-duplicate pre-clustering: records sharing (nation, name)
    # collapse to one representative BEFORE pairwise matching — a
    # k-duplicated name otherwise contributes k^2 row-edges to every
    # match it participates in (the replicated bench corpora make this
    # the dominant term: 30M row-edges vs ~300k rep-edges at sf1,
    # 191 s -> seconds). The closure runs on the representative graph;
    # members inherit their representative's component through the
    # (nation, name) join, so the final clustering is IDENTICAL — the
    # component label is internal and only min/max/count survivorship
    # aggregates surface.
    names = cust.groupBy("c_nationkey", "c_name").agg(
        F.min("c_custkey").alias("c_custkey")
    )
    edges = _symmetric_delete_edges(names)
    cc = connected_components(edges, src="src", dst="dst")
    reps = names.join(
        cc, names["c_custkey"] == cc["node"], "left"
    ).select(
        F.col("c_nationkey").alias("r_nationkey"),
        F.col("c_name").alias("r_name"),
        F.coalesce(F.col("component"), F.col("c_custkey")).alias("component"),
    )
    assigned = cust.join(
        reps,
        (cust["c_nationkey"] == reps["r_nationkey"])
        & (cust["c_name"] == reps["r_name"]),
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "component")
    golden = assigned.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("c_custkey").alias("golden_id"),
        F.min("c_name").alias("golden_name"),
        F.max(cents("c_acctbal")).cast("long").alias("best_acctbal_c"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )
    return (
        golden.select(
            "golden_id", "golden_name", "n_members", "best_acctbal_c",
            "n_segments",
        )
        .orderBy(F.col("n_members").desc(), F.col("golden_id").asc())
        .limit(_GR_TOPK)
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)


@register(
    "twap_event_value",
    oracle="""
    WITH pts AS (
      SELECT CAST(ts AS DATE) AS day,
             epoch_us(ts) AS us,
             event_id,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    seg AS (
      SELECT day, v_c,
             COALESCE(LEAD(us) OVER (
               PARTITION BY day ORDER BY us, event_id) - us, 0) AS w_us
      FROM pts
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w_us) AS BIGINT) AS span_us,
           CAST(CASE WHEN SUM(w_us) = 0 THEN NULL
                ELSE SUM(v_c * w_us) // SUM(w_us) END AS BIGINT)
             AS twap_c,
           CAST(SUM(v_c) // COUNT(*) AS BIGINT) AS mean_c
    FROM seg GROUP BY day ORDER BY day
    """,
    doc="Time-weighted average event value per day (the TWAP shape — "
    "each observation holds until the next one): LEAD over a "
    "(day)-partitioned window gives each event its holding duration in "
    "exact integer microseconds (the difference cancels any epoch "
    "offset, so the NTZ cast is timezone-free), the last event of the "
    "day holds zero. Overflow-proof BY CONSTRUCTION at any row count: "
    "per-day weights sum to the day's span (<= 8.64e10 us), so the "
    "integer numerator is bounded by max_value_c * 8.64e10 ~ 1e15 "
    "regardless of event volume. Integer-division outputs; the "
    "arithmetic mean rides along for contrast with the "
    "time-weighted one. Scale shape: one scan, one day-partitioned "
    "window, aggregation on the already-partitioned key.",
)
def twap_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        cents("value").alias("v_c"),
    )
    w = Window.partitionBy("day").orderBy(F.col("us").asc(), F.col("event_id").asc())
    seg = pts.select(
        "day",
        "v_c",
        F.coalesce(F.lead("us").over(w) - F.col("us"), F.lit(0).cast("long"))
        .alias("w_us"),
    )
    return (
        seg.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("w_us").cast("long").alias("span_us"),
            F.when(
                F.sum("w_us") == 0, F.lit(None).cast("long")
            )
            .otherwise(
                F.expr("SUM(v_c * w_us) div SUM(w_us)").cast("long")
            )
            .alias("twap_c"),
            F.expr("SUM(v_c) div COUNT(*)").cast("long").alias("mean_c"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events", "span_us", "twap_c", "mean_c",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Interval union coverage (sweep-line integral measures)


@register(
    "interval_union_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             epoch_us(MIN(ts)) AS s, epoch_us(MAX(ts)) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    deltas AS (
      SELECT day, s AS t, CAST(1 AS BIGINT) AS d, e - s AS dur FROM iv
      UNION ALL
      SELECT day, e AS t, CAST(-1 AS BIGINT) AS d, 0 FROM iv
    ),
    seg AS (
      SELECT day, dur,
             SUM(d) OVER (
               PARTITION BY day ORDER BY t, d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS running,
             COALESCE(LEAD(t) OVER (
               PARTITION BY day ORDER BY t, d DESC) - t, 0) AS gap_us
      FROM deltas
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN running > 0 THEN gap_us ELSE 0 END)
                AS BIGINT) AS covered_us,
           CAST(SUM(dur) AS BIGINT) AS total_session_us,
           CAST(SUM(CASE WHEN running > 0 THEN gap_us ELSE 0 END
                    * CASE WHEN running > 0 THEN running ELSE 0 END)
                AS BIGINT) AS user_us_integral
    FROM seg GROUP BY day ORDER BY day
    """,
    doc="Interval-union measures per day from ONE sweep pass: covered "
    "time (length of the union of the day's user-activity spans — "
    "segments between consecutive boundaries count when at least one "
    "span is open), total span time (the non-deduplicated sum), and "
    "the concurrency integral (sum of running x segment length = total "
    "user-seconds, the area under the concurrency curve). The identity "
    "integral == total_session_us is a built-in cross-check (each "
    "span contributes its own length to the integral), and "
    "covered <= total with equality iff no overlap. Same scale shape "
    "as max_concurrent_sessions: day-partitioned boundary sweep, no "
    "global sort. Segment attribution between equal boundary "
    "timestamps is zero-length (gap_us = 0), so within-tie row order "
    "cannot change any output.",
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12: built on the shared boundary-delta sweep operator (same
    # relation as max_concurrent_sessions / interval_sweep_profile).
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        daily_boundary_segments,
        union_coverage_from_segments,
    )

    from healthcare_aihw_etl_pipeline_spark.sources.catalog import table_rows

    ev = load_table(spark, sf_dir, "events")
    return union_coverage_from_segments(
        daily_boundary_segments(ev, table_rows(sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B adjustment

# Metric unit: value cents DIV 1000 per event (deka-cent units). Keeps
# every pooled moment product under 2^63 through ~sf30 (n * Sxy with
# ~4e3-unit user sums and ~1e5 users is ~4e17); beyond that, center
# the covariates in a first pass or widen to decimal.
_CUPED_UNIT = 1000
_CUPED_SPLIT_DAY = 15  # day-of-month boundary: pre <= 15 < post


@register(
    "cuped_ab_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             user_id % 2 AS variant,
             SUM(CASE WHEN day(ts) <= {_CUPED_SPLIT_DAY}
                 THEN CAST(round(value * 100) AS BIGINT) // {_CUPED_UNIT}
                 ELSE 0 END) AS x,
             SUM(CASE WHEN day(ts) > {_CUPED_SPLIT_DAY}
                 THEN CAST(round(value * 100) AS BIGINT) // {_CUPED_UNIT}
                 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS th
      FROM pooled
    ),
    v AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS nv,
             CAST(SUM(x) AS BIGINT) AS sxv,
             CAST(SUM(y) AS BIGINT) AS syv
      FROM per_user GROUP BY variant
    )
    SELECT v.variant,
           v.nv AS n_users,
           CAST(floor(CAST(v.syv AS DOUBLE) / v.nv * 1000 + 0.5)
                AS BIGINT) AS mean_y_q,
           CAST(floor((CAST(v.syv AS DOUBLE) / v.nv
                       - t.th * (CAST(v.sxv AS DOUBLE) / v.nv
                                 - CAST(t.sx AS DOUBLE) / t.n))
                      * 1000 + 0.5) AS BIGINT) AS adj_mean_q,
           CAST(floor(t.th * 1000000 + 0.5) AS BIGINT) AS theta_q
    FROM v, theta t
    ORDER BY v.variant
    """,
    doc="CUPED variance-reduced A/B read-out (Deng et al.'s "
    "pre-experiment covariate adjustment, the industry-standard "
    "experimentation op): per-user pre-period metric X (days 1-15) "
    "and post-period metric Y (days 16+) in deka-cent units, pooled "
    "theta = cov(X,Y)/var(X) from EXACT integer moments "
    "(n*Sxy - Sx*Sy over n*Sxx - Sx^2 — one IEEE divide on "
    "identically-rounded casts), and per-variant adjusted means "
    "Y_v - theta*(X_v - X) in one fixed expression order, "
    "milli-quantized. Variant is deterministic (user_id % 2). Scale "
    "shape: one groupBy(user) over the fact table, then a 1-row and a "
    "2-row aggregate crossJoined back — the adjustment itself is "
    "O(variants). Unit quantization keeps every moment product under "
    "2^63 through ~sf30 (documented at the constant).",
)
def cuped_ab_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    unit = F.expr(
        f"CAST(round(value * 100) AS BIGINT) div {_CUPED_UNIT}"
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= _CUPED_SPLIT_DAY, unit).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.dayofmonth("ts") > _CUPED_SPLIT_DAY, unit).otherwise(0)
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2).alias("variant"), "x", "y"
    )
    # Per-variant moments in ONE aggregation; pooled sums come from an
    # unpartitioned window over the |variants|-row relation (free, and
    # it keeps the fact table scanned ONCE — a separate pooled
    # aggregate branch would rebuild per_user and re-scan; plan-pinned).
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.sum("x").cast("long").alias("sxv"),
        F.sum("y").cast("long").alias("syv"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxxv"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxyv"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pooled = v.select(
        "variant",
        "nv",
        "sxv",
        "syv",
        F.sum("nv").over(w).alias("n"),
        F.sum("sxv").over(w).alias("sx"),
        F.sum("syv").over(w).alias("sy"),
        F.sum("sxxv").over(w).alias("sxx"),
        F.sum("sxyv").over(w).alias("sxy"),
    )
    th = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
    )
    mean_y = F.col("syv").cast("double") / F.col("nv")
    adj = mean_y - th * (
        F.col("sxv").cast("double") / F.col("nv")
        - F.col("sx").cast("double") / F.col("n")
    )
    return (
        pooled.select(
            "variant",
            F.col("nv").alias("n_users"),
            F.floor(mean_y * 1000 + F.lit(0.5)).cast("long").alias("mean_y_q"),
            F.floor(adj * 1000 + F.lit(0.5)).cast("long").alias("adj_mean_q"),
            F.floor(th * 1000000 + F.lit(0.5)).cast("long").alias("theta_q"),
        )
        .orderBy("variant")
    )
