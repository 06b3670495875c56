"""Window-shaped analytics (SURVEY §2.6 W1/W2) plus the full window surface
the driver mandates (row_number/rank/lag/lead/frames).

The reference computes these with sort+iloc on the driver; here they are
single-pass aggregations or window functions.

Scale notes:
- `first_last_pct_change` uses min_by/max_by — one aggregation, no window,
  no sort. The window formulation would shuffle everything to one
  partition (no PARTITION BY); the agg formulation keeps partial combine.
- `argmax_row` uses max_by over structs — again aggregation, not sort.
- `top_k_per_group` is the one true window op: shuffle on the partition
  key, per-partition sort, early-stopping rank filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_last_pct_change(
    df: DataFrame, order_col: str, measure: str
) -> DataFrame:
    """W1 — pct change between first and last value of a series ordered by
    `order_col` (yearly trend, /root/reference/streamlit_app.py:99-102).

    Returns one row: first_<order>, last_<order>, pct_change.
    Implemented as min_by/max_by aggregation: `(last-first)/first*100`.
    """
    agg = df.groupBy().agg(
        F.min(order_col).alias(f"first_{order_col}"),
        F.max(order_col).alias(f"last_{order_col}"),
        F.min_by(measure, order_col).alias("_first_v"),
        F.max_by(measure, order_col).alias("_last_v"),
    )
    return agg.select(
        f"first_{order_col}",
        f"last_{order_col}",
        F.round(
            (F.col("_last_v") - F.col("_first_v")) / F.col("_first_v") * 100, 4
        ).alias("pct_change"),
    )


def argmax_row(df: DataFrame, by: str, measure: str) -> DataFrame:
    """W2 — the row (key + measure) with the max measure
    (top state / top category, /root/reference/streamlit_app.py:82-85,92-96).

    `max_by` ties are nondeterministic; break them on the key itself by
    max_by-ing a (measure, key) struct — deterministic at any parallelism.
    """
    pair = F.struct(F.col(measure).alias("m"), F.col(by).alias("k"))
    best = df.groupBy().agg(F.max(pair).alias("best"))
    return best.select(
        F.col("best.k").alias(by), F.col("best.m").alias(measure)
    )


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    k: int,
    *,
    tiebreak: Sequence[str] = (),
    rank_fn: str = "row_number",
    rank_name: str = "rn",
) -> DataFrame:
    """Driver-mandated ranking surface (SURVEY §2.6): top-k rows per group
    via row_number/rank/dense_rank over a descending window."""
    order = [F.desc(order_col), *[F.asc(c) for c in tiebreak]]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    ranked = df.withColumn(rank_name, getattr(F, rank_fn)().over(w))
    return ranked.where(F.col(rank_name) <= k)


def top_k_per_group_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    k: int,
    *,
    tiebreak: Sequence[str] = (),
    rank_name: str = "rn",
) -> DataFrame:
    """Sort-free top-k per group for SMALL k: k max_by scan-aggregates.

    The window form (`top_k_per_group`) sorts every map partition before
    the group-limit can prune — the sort dominates when k << group size.
    This variant runs k rounds; each round takes per group the max of a
    (order_col, -tiebreaks, full-row) struct — an ordinary hash aggregate
    with map-side partial combine, so the shuffle carries one candidate
    row per (task, group) and nothing is ever sorted. Winners are removed
    between rounds with a broadcast anti-join on the ranking key (the
    winner set is |groups| rows — broadcast-sized by construction).

    Requirements: `tiebreak` columns must be numeric (they are negated so
    "ascending tiebreak" becomes part of one max), and (order_col,
    *tiebreak) must be unique within a group — the same determinism
    condition under which row_number itself is well-defined. NULLs in
    order/tiebreak columns are handled: winner removal uses null-safe
    equality, so a null-keyed winner is still removed from later rounds
    (a plain equi-anti-join would never match it and re-select it with
    every rank — duplicate winners).

    Scale: k scans of the (column-pruned) input vs one scan + one sort.
    Wins while k * scan_cost < sort_cost; for large k use the window form.
    """
    tb = list(tiebreak)
    neg = [(-F.col(c)).alias(f"_t{i}") for i, c in enumerate(tb)]
    work = df.select(*df.columns, *neg)
    key_fields = [order_col, *[f"_t{i}" for i in range(len(tb))]]
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("_row")
    best_struct = F.struct(
        *[F.col(c) for c in key_fields], payload
    )
    rounds: list[DataFrame] = []
    remaining = work
    for rn in range(1, k + 1):
        best = remaining.groupBy(*partition_by).agg(
            F.max(best_struct).alias("_b")
        )
        rounds.append(
            best.select(F.col("_b._row").alias("_row")).select(
                "_row.*", F.lit(rn).alias(rank_name)
            )
        )
        if rn < k:
            winner_keys = best.select(
                *partition_by,
                *[F.col(f"_b.{c}").alias(c) for c in key_fields],
            )
            # eqNullSafe, not an equi-join: a NULL order/tiebreak value
            # still identifies a winner row, and plain `=` would leave it
            # in `remaining` forever (advisor-reported duplicate-winner
            # bug). NULL-safe equality still hashes/broadcasts fine.
            left = remaining.alias("_l")
            right = F.broadcast(winner_keys.alias("_r"))
            cond = None
            for c in [*partition_by, *key_fields]:
                e = F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}"))
                cond = e if cond is None else cond & e
            remaining = left.join(right, cond, "left_anti").select(
                *[F.col(f"_l.{c}").alias(c) for c in work.columns]
            )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out
