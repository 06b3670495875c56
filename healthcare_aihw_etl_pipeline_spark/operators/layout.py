"""Data-layout operators: multi-dimensional clustering (Z-order) for
write-side file organization.

The reference replaces whole tables on every load
(/root/reference/main.py:158,165 — `if_exists="replace"`), leaving
layout to Postgres. At 100 TB the dominant cost of every query in
SURVEY §2.3/§2.5 is how few files a filter has to open: partitioning
prunes ONE dimension; Z-ordering bounds per-file min/max ranges on
SEVERAL dimensions at once, so parquet row-group/file skipping works
for filters on any interleaved column (the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`; public literature: Morton curves).

Everything here is pure integer Catalyst expressions — bucket, bit-
interleave, range-repartition — so the layout pass is shuffle-bounded
(one range exchange) and whole-stage-codegen'd, and the Z-value math
is exactly replayable in any engine (the `zorder_layout_stats` query
hash-checks it against DuckDB).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_min_splits(df: DataFrame) -> DataFrame:
    """Round-robin repartition `df` to the session's default
    parallelism ONLY when the scan arrives under-split (fewer
    partitions than cores) — the small-SF case where one or two
    parquet splits would serialize a row-local expression pass on 2 of
    32 cores. When the input already has >= defaultParallelism
    partitions (every real-cluster scan), this is a true no-op: no
    round-robin exchange is inserted, preserving the zero-shuffle
    shape of row-local passes (an unconditional repartition() always
    shuffles, even when the partition count is already sufficient)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def bucketize(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Monotone fixed-width bucketing of an integer column into 2^bits
    buckets over [lo, hi], all in exact integer arithmetic:
    (v - lo) * 2^bits DIV (hi - lo + 1). Callers supply lo/hi from a
    one-row bounds aggregate (computed once per write, broadcast)."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    n = 1 << bits
    span = hi_c.cast("long") - lo_c.cast("long") + F.lit(1)
    scaled = (col.cast("long") - lo_c.cast("long")) * F.lit(n)
    # floor(long/long) == integer floor-division exactly while the
    # numerator stays below 2^53 (bucket inputs here are ≤ 2^40); both
    # operands are non-negative by construction.
    return F.floor(scaled / span).cast("long")


def zvalue(xb: Column, yb: Column, bits: int = 8) -> Column:
    """Morton/Z-value of two `bits`-wide bucket ids: interleave their
    bits (x on even positions, y on odd). Pure shift/mask expressions —
    stays inside whole-stage codegen; no UDF."""
    terms = []
    for k in range(bits):
        terms.append(F.shiftleft(F.shiftright(xb, k).bitwiseAND(F.lit(1)), 2 * k))
        terms.append(
            F.shiftleft(F.shiftright(yb, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("long")


def sql_zvalue(xb: str, yb: str, bits: int = 8) -> str:
    """ANSI-SQL twin of :func:`zvalue` (integer div/mod arithmetic) for
    oracle replay."""
    terms = []
    for k in range(bits):
        terms.append(f"(({xb} // {1 << k}) % 2) * {1 << (2 * k)}")
        terms.append(f"(({yb} // {1 << k}) % 2) * {1 << (2 * k + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    *,
    bits: int = 8,
    prefix_bits: int = 4,
    bounds: tuple[int, int, int, int] | None = None,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of (x, y), with
    files ALIGNED to Z-prefix cells (2^prefix_bits files/cells).

    Alignment matters: cutting files by range quantiles over the raw
    Z-value straddles Morton-curve discontinuities — a file crossing a
    top-level cell boundary spans the FULL domain on one dimension
    (measured: xs=255/255 on the straddling file vs ≤63 aligned),
    destroying exactly the min/max skipping the layout exists for. So
    the file key is the Z-prefix: partitionBy writes one file per cell
    a task holds, hash-repartitioning on the cell id first so each cell
    lands wholly in one task; the partition-local sort on the full
    Z-value keeps row groups inside each file tight as well. Skewed
    data makes cell files uneven — at scale pick `prefix_bits` so the
    densest cell ≈ target file size (cells are a histogram you can
    estimate from a sample), or recurse the split inside hot cells.

    `bounds` = (x_lo, x_hi, y_lo, y_hi); when omitted they are computed
    with one bounds aggregate (at scale: table statistics)."""
    if prefix_bits > 2 * bits:
        # shiftright by a negative amount silently collapses every row
        # into one cell — reject instead.
        raise ValueError(
            f"prefix_bits ({prefix_bits}) must be <= 2*bits ({2 * bits})"
        )
    if bounds is None:
        b = df.agg(
            F.min(x).alias("xlo"),
            F.max(x).alias("xhi"),
            F.min(y).alias("ylo"),
            F.max(y).alias("yhi"),
        ).first()
        bounds = (b.xlo, b.xhi, b.ylo, b.yhi)
        if any(v is None for v in bounds):
            # Empty input: min/max return NULL, which would flow into
            # bucketize as lit(None) and yield all-NULL z-values.
            raise ValueError("cannot Z-order an empty DataFrame (NULL bounds)")
    xlo, xhi, ylo, yhi = bounds
    z = zvalue(
        bucketize(x, xlo, xhi, bits), bucketize(y, ylo, yhi, bits), bits
    )
    n_cells = 1 << prefix_bits
    (
        df.withColumn("_z", z)
        .withColumn("_zcell", F.shiftright(F.col("_z"), 2 * bits - prefix_bits))
        .repartition(n_cells, "_zcell")
        .sortWithinPartitions("_zcell", "_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("_zcell")
        .parquet(path)
    )


def shard_by_budget(
    df: DataFrame,
    order_col: str,
    cost_col: str,
    budget: int,
    *,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic export-shard assignment by running cost budget: in
    the total order of `order_col`, each row lands in shard
    floor(start_offset / budget) where start_offset is the exclusive
    prefix sum of `cost_col` — the token-budget sharding step of a
    training-data export (every shard holds ~budget tokens, order
    preserved, assignment reproducible run-to-run and engine-to-engine).

    DISTRIBUTED prefix sum — no single-partition global window: rows are
    range-repartitioned on the total order, per-partition cost subtotals
    form an exclusive prefix over the PARTITION-COUNT-sized frame (the
    only unpartitioned window, bounded at the shuffle-partition count,
    never the data), and each row's global offset is its partition's
    offset plus an intra-partition running sum — per-partition windows
    that parallelize across executors. The result is independent of
    where the range boundaries land because the order key is total, so
    the assignment is identical on 1 or 1000 executors. Adds columns
    `cum` (inclusive prefix sum) and `shard` (0-based).

    Determinism contract: (order_col, *tiebreak_cols) MUST be a total
    order — with duplicate order keys the intra-partition running sum
    (and thus cum/shard) would be partition-layout-dependent, breaking
    the reproducibility this operator exists for. Pass `tiebreak_cols`
    (e.g. a unique id) whenever `order_col` alone can repeat; the range
    repartition still keys on `order_col` only (equal keys land in one
    range partition, so the partition-local window sees and breaks all
    ties)."""
    from pyspark.sql import Window

    if int(budget) <= 0:
        # Spark's `div 0` yields NULL, which would assign every row a
        # NULL shard silently — fail loudly instead.
        raise ValueError(f"budget must be positive, got {budget}")
    order_cols = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in tiebreak_cols
    ]
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = df.repartitionByRange(
        n_parts, F.col(order_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = (
        base.groupBy("_pid")
        .agg(F.sum(cost_col).alias("_c"))
        .select(
            "_pid", (F.sum("_c").over(woff) - F.col("_c")).alias("_off")
        )
    )
    wlocal = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(off), "_pid")
        .withColumn(
            "cum", F.sum(cost_col).over(wlocal) + F.col("_off")
        )
        .withColumn(
            # Exact integer floor-division (`div`, DuckDB `//`): a
            # double divide mis-floors once offsets outgrow the ~2^53
            # ulp radius — real at 100 TB token scales.
            "shard",
            F.expr(f"(cum - {cost_col}) div {int(budget)}").cast("long"),
        )
        .drop("_pid", "_off")
    )
