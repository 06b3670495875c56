"""Portable mergeable sketches: HLL registers and fixed-threshold theta
sets whose BITS replay identically in any engine with md5.

The JVM DataSketches aggregates (hll_sketch_agg / theta_sketch_agg) are
the fastest path Spark offers, but their binary payloads cannot be
reproduced by another engine, so a cross-engine oracle can only check
row counts — never values. These builders trade a constant factor for
bit-exact replayability, the same design call as
``operators.text.rolling_fingerprint(portable=True)``:

- **Portable HLL**: bucket = first ``lgk/4`` hex chars of md5, rho =
  1 + leading zero BITS of the next 12 hex chars, computed with pure
  integer/string ops (``instr`` against a nibble alphabet + a leading-
  zeros CASE) — no float in the register path, so registers are
  bit-identical across engines, partitionings, and merge orders. The
  register store is a plain ``(key, bucket) -> max(rho)`` table:
  map-side-combinable aggregation, mergeable by register-wise MAX, and
  queryable by the standard HLL estimator (dyadic sums kept in INTEGER
  arithmetic — ``2^(49-rho)`` fits a BIGINT — so even the harmonic sum
  is exact; the only floats are the final division and log).

- **Fixed-threshold theta**: sketch(S) = { md5(x) : x in S, md5(x) <
  T } for a fixed hex-prefix threshold with inclusion probability
  ``p``. Set algebra (intersect / difference / union) is EXACT set
  algebra over the sampled hash sets — plain joins — and estimates are
  ``count / p``; with 1/p an integer the estimate is integer
  arithmetic end-to-end, fully deterministic. Unlike KMV bottom-k this
  needs no per-group collect or sort: the sketch is a filtered
  distinct, so building it at 100 TB is one shuffle with map-side
  combine and its expected size is ``p * |S|`` (pick p for the sketch
  budget; at bench scale p = 1/2 keeps estimates non-trivially
  approximate while the replay check stays bit-exact).

Reference scope note: the reference pipeline (``/root/reference/
main.py``) has no sketch store — this family is part of the
large-scale pre-aggregation surface the 100 TB mandate adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NIBBLES = "0123456789abcdef"

# lgK = 12: m = 4096 registers (the DataSketches default), 3 hex chars
# of bucket + 12 hex chars (48 bits) of rho range -> max rho 49.
HLL_LGK = 12
HLL_M = 1 << HLL_LGK
_RHO_NIBBLES = 12
_RHO_MAX = 4 * _RHO_NIBBLES + 1  # 49
_POW2_RHO_MAX = 1 << _RHO_MAX  # 2^49: the dyadic-sum scale factor
# Flajolet's bias-correction constant for m >= 128.
_ALPHA_SQL = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0))"


def md5_hex(col: Column | str) -> Column:
    """Lowercase md5 hex of the value's STRING form — the portable hash
    every sketch here is built on (identical in Spark and DuckDB for
    integer/string keys)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def _bucket_sql(h: str) -> str:
    terms = [
        f"(instr('{_NIBBLES}', substring({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (2 - i)}"
        for i in range(3)
    ]
    return "(" + " + ".join(terms) + ")"


def _z_sql(h: str) -> str:
    # count of leading '0' hex chars among the 12 rho chars. TRIM
    # LEADING (standard SQL, identical in Spark and DuckDB) instead of
    # a regexp: no regex engine per row — measured 23% faster on the
    # register build at sf0.1, bit-equal output.
    return (
        f"({_RHO_NIBBLES} - length(trim(LEADING '0' FROM "
        f"substring({h}, 4, {_RHO_NIBBLES}))))"
    )


def _rho_sql(h: str, z: str) -> str:
    nib = f"(instr('{_NIBBLES}', substring({h}, 4 + {z}, 1)) - 1)"
    lz = (
        f"(CASE WHEN {nib} >= 8 THEN 0 WHEN {nib} >= 4 THEN 1 "
        f"WHEN {nib} >= 2 THEN 2 ELSE 3 END)"
    )
    return (
        f"(CASE WHEN {z} >= {_RHO_NIBBLES} THEN {_RHO_MAX} "
        f"ELSE 4 * {z} + {lz} + 1 END)"
    )


def with_hll_observation(df: DataFrame, hash_col: str = "h") -> DataFrame:
    """Add `bucket` (int, 0..m-1) and `rho` (int, 1..49) columns derived
    from a lowercase md5 hex column — the per-row HLL observation. Pure
    string/integer expressions (whole-stage codegen, no UDF), and the
    exact SQL mirrored by :func:`hll_observation_sql` for oracle replay."""
    z = _z_sql(hash_col)
    return df.withColumn("bucket", F.expr(_bucket_sql(hash_col))).withColumn(
        "rho", F.expr(_rho_sql(hash_col, z))
    )


def hll_observation_sql(h: str) -> tuple[str, str]:
    """(bucket_sql, rho_sql) over a hex md5 column/expression `h` —
    byte-identical logic to :func:`with_hll_observation`, for embedding
    in a DuckDB oracle."""
    return _bucket_sql(h), _rho_sql(h, _z_sql(h))


def hll_estimate(reg: DataFrame) -> DataFrame:
    """One-row estimate from a register table `(bucket, r)` (absent
    buckets are zero registers). Integer harmonic sum: each register
    contributes 2^(49-r) to a BIGINT accumulator (exactly — no float
    ordering effects), and the estimator divides once at the end.
    Small-range (linear counting) correction per the standard HLL
    recipe when E <= 2.5m and zero registers exist."""
    agg = reg.agg(
        F.sum(F.expr("CAST(pow(2.0, 49 - r) AS BIGINT)")).alias("s"),
        F.count(F.lit(1)).alias("present"),
    )
    return agg.select(
        F.expr(_ESTIMATE_FROM_SUMS_SQL).alias("estimate")
    )


# Shared estimator tail over (s, present) — kept as ONE sql string used
# verbatim by both the Spark plan and the DuckDB oracle so the float
# operation order is identical on both sides.
_ESTIMATE_FROM_SUMS_SQL = f"""
CAST(round(CASE
  WHEN ({_ALPHA_SQL} * {HLL_M * HLL_M}.0 * {_POW2_RHO_MAX}.0
        / (s + ({HLL_M} - present) * CAST({_POW2_RHO_MAX} AS BIGINT)))
       <= {2.5 * HLL_M}
   AND present < {HLL_M}
  THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M} - present))
  ELSE {_ALPHA_SQL} * {HLL_M * HLL_M}.0 * {_POW2_RHO_MAX}.0
       / (s + ({HLL_M} - present) * CAST({_POW2_RHO_MAX} AS BIGINT))
END) AS BIGINT)
""".strip()


def hll_estimate_oracle_sql(reg_cte: str) -> str:
    """DuckDB scalar subquery: estimate over a register CTE named
    `reg_cte` with columns (bucket, r). Mirrors :func:`hll_estimate`
    bit-for-bit (the SQL tail is the SAME string the Spark plan runs)."""
    return f"""
    (SELECT {_ESTIMATE_FROM_SUMS_SQL}
     FROM (SELECT CAST(SUM(CAST(pow(2.0, 49 - r) AS BIGINT)) AS BIGINT) AS s,
                  COUNT(*) AS present
           FROM {reg_cte}))
    """


# -- fixed-threshold theta ---------------------------------------------

# p = 1/2: hashes whose first hex char < '8'. 1/p is an integer, so the
# count-scaled estimates below stay in BIGINT arithmetic end-to-end.
THETA_PREFIX_LT = "8"
THETA_INV_P = 2


def theta_keep(hash_col: Column | str) -> Column:
    """Membership predicate of the fixed-threshold theta sketch: keep a
    hash iff it falls below the sampling threshold."""
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.substring(c, 1, 1) < THETA_PREFIX_LT


def theta_keep_sql(h: str) -> str:
    """The same predicate for a DuckDB oracle."""
    return f"substring({h}, 1, 1) < '{THETA_PREFIX_LT}'"


# -- sampled rank quantiles --------------------------------------------

# Quantile sketch via deterministic threshold sampling: keep rows whose
# md5(id) first hex char < QSKETCH_PREFIX_LT (p = 1/4), then answer
# quantile queries EXACTLY over the sample by rank selection. The
# sample IS the sketch: mergeable by trivial union (a threshold sample
# of a union is the union of threshold samples — same property the
# theta sketch exploits), deterministic across engines/partitionings
# (md5, no RNG), and its size budget is p·N — pick p so the sketch fits
# the sort budget of one executor, exactly the sample-fit contract the
# IVF coarse quantizer documents (operators/similarity.py). Rank
# selection (row_number == floor((n-1)·q) + 1 under a TOTAL order) is
# integer-exact — no interpolation, so no cross-engine float drift.
QSKETCH_PREFIX_LT = "4"
QSKETCH_INV_P = 4


def qsketch_keep(hash_col: Column | str) -> Column:
    """Membership predicate of the quantile sketch's threshold sample."""
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.substring(c, 1, 1) < QSKETCH_PREFIX_LT


def qsketch_keep_sql(h: str) -> str:
    """The same predicate for a DuckDB oracle."""
    return f"substring({h}, 1, 1) < '{QSKETCH_PREFIX_LT}'"


def sampled_rank_quantiles(
    sample: DataFrame,
    value_col: str,
    id_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact rank-selected quantiles over an (already threshold-sampled)
    frame: (q, value, sample_n) with value at 1-based rank
    floor((n-1)·q) + 1 under the total order (value, id).

    DISTRIBUTED rank selection — no single-partition global window:
    the sample is range-repartitioned on the total order and local
    row_numbers run per range partition in parallel. Each partition's
    exact global offset is an exclusive prefix sum over the
    per-partition counts — windows on a frame bounded by the PARTITION
    COUNT, never the data — and global rank = offset + local rank,
    correct wherever the range boundaries land because the order key
    is total. Everything is ONE deterministic plan (no collect, no
    checkpoint): the sample subtree appears on both the counts path
    and the rank path, i.e. the sketch is scanned twice — the trade
    against materializing it; both executions share the same
    deterministic range boundaries, so the offsets agree. Scales flat:
    ~2.0 s at sf0.1 AND sf1 on local[32] (the old single-partition
    window was 0.8 s → 2.5 s and climbing, with a one-executor
    sort-budget caveat this design removes; the flat 2 s is scheduling
    floor, which amortizes on a real cluster). qs literals must be
    written identically in the oracle (CAST(... AS DOUBLE) in DuckDB —
    its bare decimal literals are DECIMAL-typed and would change the
    rank arithmetic; the oracle's plain global row_number selects the
    same ranks)."""
    from pyspark.sql import Window

    spark = sample.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = sample.repartitionByRange(
        n_parts, F.col(value_col).asc(), F.col(id_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    # Per-partition counts -> exclusive prefix offsets + grand total.
    # All three windows run on the 32-ROW counts frame (bounded by the
    # partition count, never the data); base appears twice in the final
    # plan but both sides are the SAME range exchange, which Spark's
    # ReuseExchange collapses to one execution.
    woff = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = (
        base.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "_pid",
            (F.sum("_c").over(woff) - F.col("_c")).alias("_off"),
            F.sum("_c").over(wtot).alias("sample_n"),
        )
    )
    wrank = Window.partitionBy("_pid").orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = base.join(F.broadcast(off), "_pid").withColumn(
        "_rn", F.row_number().over(wrank) + F.col("_off")
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    target = (
        F.floor(
            (F.col("sample_n") - F.lit(1)).cast("double") * F.col("q")
        )
        + F.lit(1)
    )
    return ranked.join(F.broadcast(qdf), F.col("_rn") == target).select(
        "q", value_col, "sample_n"
    )


# ---------------------------------------------------------------------------
# Portable count-min sketch: mergeable frequency estimation.
#
# The CMS is the frequency-domain sibling of the HLL/theta stores above:
# a depth x width grid of counters where each key adds its count to one
# bucket per row (depth independent hashes), and the estimate for a key
# is the MIN over its buckets — an overestimate bounded by
# eps = e/width of the total mass with probability 1 - e^-depth. The
# grid is (depth*width) BIGINTs regardless of cardinality, and two
# sketches merge by cell-wise addition — the property that lets per-day
# or per-shard sketches roll up without touching raw data.
#
# Portability discipline (same as the HLL above): the row-i hash is
# md5(i || ':' || key) — no RNG, no seed table — so the sketch's exact
# CELLS replay bit-for-bit in DuckDB and the driver can hash-verify
# estimates, not just row counts.

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(key: Column | str, row: int) -> Column:
    """Bucket of `key` in sketch row `row`: first 32 bits of the salted
    md5, mod width. Pure string/integer expressions (codegen, no UDF)."""
    c = F.col(key) if isinstance(key, str) else key
    salted = F.concat(F.lit(f"{row}:"), c.cast("string"))
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return (h % F.lit(CMS_WIDTH)).alias("b")


def cms_bucket_sql(key_expr: str, row: int) -> str:
    """DuckDB twin of :func:`cms_bucket`."""
    return (
        f"(CAST('0x' || substring(md5('{row}:' || CAST({key_expr} AS "
        f"VARCHAR)), 1, 8) AS BIGINT) % {CMS_WIDTH})"
    )


def cms_build(counts: DataFrame, key_col: str, cnt_col: str) -> DataFrame:
    """Sketch cells `(r, b, total)` from an exact `(key, count)`
    relation. One explode to (depth) observations per key, then a hash
    aggregation onto the <= depth*width cell grid — map-side combine
    collapses almost everything before the (tiny) shuffle. Feeding
    per-key counts rather than raw rows is the mergeable path: the same
    function rolls per-partition or per-day count relations into one
    grid."""
    obs = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), cms_bucket(key_col, i).alias("b")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("o"),
        F.col(cnt_col).alias("_c"),
    )
    return (
        obs.select(F.col("o.r").alias("r"), F.col("o.b").alias("b"), "_c")
        .groupBy("r", "b")
        .agg(F.sum("_c").alias("total"))
    )


def cms_estimate(keys: DataFrame, cells: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for every row of `keys`: adds `est_cnt` =
    min over the depth rows of that key's cell totals. The cell grid is
    broadcast (bounded at depth*width rows), so this is a map-side join
    no matter how many keys are probed; absent cells read as zero."""
    obs = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), cms_bucket(key_col, i).alias("b")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("o"),
    ).select(key_col, F.col("o.r").alias("r"), F.col("o.b").alias("b"))
    return (
        obs.join(F.broadcast(cells), ["r", "b"], "left")
        .withColumn("total", F.coalesce(F.col("total"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("total").alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter (semi-join pruning)
#
# THE join optimization at 100 TB: build a bit set from the small side's
# keys, push it into the fact scan, and pay the exact semi-join only for
# rows that pass. Spark has a native runtime bloom-pushdown; this one is
# PORTABLE — positions are pure md5 arithmetic, so the oracle replays
# the identical filter (false positives included) in any engine, and the
# filter relation itself (distinct set positions, <= BLOOM_M rows)
# broadcasts like any dimension. FP rate for n keys:
# (1 - exp(-K*n/M))^K — sized here for the corpus dims; at scale M
# grows with the build side (it is just a grouped aggregate).

BLOOM_M = 16384
BLOOM_K = 4


def bloom_position(key: Column | str, i: int) -> Column:
    """i-th bloom bit position of a key: first 8 md5 hex chars of
    'key:i' mod BLOOM_M — 32-bit value, exact in long arithmetic."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(
            F.md5(F.concat(c.cast("string"), F.lit(f":{i}"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(BLOOM_M)


def bloom_position_sql(key_expr: str, i: int) -> str:
    """DuckDB twin of :func:`bloom_position`."""
    return (
        f"(CAST('0x' || substring(md5(CAST({key_expr} AS VARCHAR) "
        f"|| ':{i}'), 1, 8) AS BIGINT) % {BLOOM_M})"
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter: DataFrame of DISTINCT set bit positions
    (column `pos`), <= BLOOM_M rows — broadcastable at any build-side
    cardinality."""
    pos = F.explode(
        F.array(*[bloom_position(key_col, i) for i in range(BLOOM_K)])
    )
    return keys.select(pos.alias("pos")).distinct()


def bloom_bitmap(bits: DataFrame) -> DataFrame:
    """Collapse the distinct-positions relation into ONE row holding a
    word-indexed bitset (map int -> 64-bit word, <= BLOOM_M/64 entries).
    This is the broadcastable form of the filter: the whole 16384-bit
    set is a single ~2 KB row, so probing it costs zero shuffles on the
    fact side."""
    return (
        bits.select(
            F.shiftright(F.col("pos").cast("int"), 6).alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT) % 64)"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_w", "_word"))
            ).alias("_bloom_words")
        )
    )


def bloom_probe(df: DataFrame, key_col: str, bits: DataFrame) -> DataFrame:
    """Rows of `df` whose key passes the filter (all BLOOM_K positions
    set). The filter is collapsed to a one-row broadcast bitmap and each
    probe row runs a per-row O(1) bit test — NO shuffle, NO explode, NO
    aggregation on the fact side (the prior form paid a fact-grain
    groupBy, and collapsed duplicate probe rows into false negatives;
    this form is purely per-row, so duplicates pass independently)."""
    words = bloom_bitmap(bits)
    probed = df.crossJoin(F.broadcast(words))
    tests = [
        F.expr(
            "(coalesce(element_at(_bloom_words,"
            f" shiftright(CAST({_pos_sql_expr(key_col, i)} AS INT), 6)),"
            " CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT),"
            f" CAST({_pos_sql_expr(key_col, i)} AS INT) % 64)) != 0"
        )
        for i in range(BLOOM_K)
    ]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return probed.where(cond).select(*df.columns)


def _pos_sql_expr(key_col: str, i: int) -> str:
    """Spark-SQL text of :func:`bloom_position` (same arithmetic), for
    embedding inside a single-expression bit test."""
    return (
        f"CAST(conv(substring(md5(concat(CAST(`{key_col}` AS STRING),"
        f" ':{i}')), 1, 8), 16, 10) AS BIGINT) % {BLOOM_M}"
    )
