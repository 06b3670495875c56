"""Slowly-changing-dimension (type 2) history construction.

Warehouse ETL's canonical dimension-maintenance pattern: given an
event/change stream carrying an entity key, a tracked attribute, and an
event time, produce one row per CONSECUTIVE run of equal attribute
values with (valid_from, valid_to, is_current) — the SCD2 history
table. The reference pipeline stops at two-tier staging/clean tables
(/root/reference/main.py:98-133); SCD2 is the natural next tier for a
warehouse engine and is required the moment a dimension's attributes
change over time.

Implementation is pure window algebra (no UDF, no collect):

1. lag(attr) over (key ORDER BY ts, tiebreak) marks run starts —
   a row whose attribute differs from its predecessor (or has none).
2. Filtering to run starts and taking lead(ts) over the same ordering
   yields each run's half-open validity interval [valid_from,
   valid_to); the last run per key has valid_to NULL and is_current
   true.

Scale: one shuffle on the entity key; both window functions are
streaming frames (no buffering beyond the sort), so skewed entities
cost sort time, not memory blowup. Determinism: callers must pass a
`tiebreak` column making (key, ts, tiebreak) a total order — otherwise
equal-timestamp changes would make run boundaries engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD2 history of `attr_col` per `key_col` ordered by
    (`ts_col`, `tiebreak_col`).

    Returns (key, attr, valid_from, valid_to, is_current): one row per
    maximal run of consecutive equal attribute values; valid_to is the
    start of the next run (half-open interval) and NULL on the current
    run.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    marked = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    # Null-safe run-start detection: `_prev != attr` is NULL (not true)
    # when either side is NULL, which would silently absorb value->NULL
    # transitions into the prior run. A first row is a start regardless
    # (`_rn` distinguishes "no predecessor" from "predecessor was NULL");
    # otherwise a start is any not-null-safe-equal transition, so
    # NULL->value, value->NULL, and NULL runs all get their own periods.
    starts = marked.where(
        (F.col("_rn") == 1)
        | ~F.col("_prev").eqNullSafe(F.col(attr_col))
    )
    # Re-window over run starts only: lead() of the NEXT run's start.
    # (ts, tiebreak) ordering restricted to starts is still total.
    ws = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return starts.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(ws).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
