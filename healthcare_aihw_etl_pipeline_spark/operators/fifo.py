"""FIFO allocation matching as a reusable operator.

The interval-intersection formulation (see plans.round11b_queries.
fifo_return_matching, where it was introduced and property-tested
against the sequential matching loop): per part, shipments and returns
each become cumulative-quantity intervals [lo, hi) in FIFO order, and
the allocation of each return against each shipment is the overlap of
their intervals. Extracted here in round 12 so the batch query and the
streaming twin (streaming.fifo.part_fifo_matching) share one
definition of the allocation relation and the replay-equivalence test
can compare full relations, not just the query's top-20 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_interval_alloc(li: DataFrame) -> DataFrame:
    """Per-part FIFO allocation of returns (flag R) against shipments
    (flag N), exact integer quantities.

    Output: (partkey, matched_qty, unmatched_qty, qty_age_days), one
    row per part having at least one shipment AND one return (the
    cumulative intervals of the first shipment and first return both
    start at 0, so such a part always has >= 1 overlap row; parts with
    only one side never enter the demand-supply join).

    Scale: both cumulative windows partition by part (bounded rows per
    part by the data model), the match is an equi join on partkey with
    the interval overlap as a residual predicate — co-partitioned,
    never a range-only join — and per-part fan-out is linear in lines
    per part because each demand interval overlaps on average O(1)
    supply intervals.
    """
    qty = F.col("l_quantity").cast("long")

    def leg(flag: str, lo: str, hi: str, date_alias: str) -> DataFrame:
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return li.where(F.col("l_returnflag") == flag).select(
            "l_partkey",
            F.sum(qty).over(w).alias(hi),
            (F.sum(qty).over(w) - qty).alias(lo),
            F.col("l_shipdate").alias(date_alias),
        )

    supply = leg("N", "slo", "shi", "sdate").withColumnRenamed(
        "l_partkey", "s_partkey"
    )
    # Per-part demand total rides the same partition exchange as the
    # cumulative window — no second scan, no separate aggregate branch.
    demand = leg("R", "dlo", "dhi", "ddate").withColumn(
        "dq",
        F.sum(F.col("dhi") - F.col("dlo")).over(
            Window.partitionBy("l_partkey")
        ),
    )
    matched = (
        demand.join(
            supply,
            (F.col("l_partkey") == F.col("s_partkey"))
            & (F.col("slo") < F.col("dhi"))
            & (F.col("dlo") < F.col("shi")),
        )
        .select(
            "l_partkey",
            "dq",
            (
                F.least(F.col("shi"), F.col("dhi"))
                - F.greatest(F.col("slo"), F.col("dlo"))
            ).alias("mq"),
            F.datediff(F.col("ddate"), F.col("sdate"))
            .cast("long")
            .alias("age"),
        )
    )
    alloc = matched.groupBy("l_partkey").agg(
        F.sum("mq").alias("matched_qty"),
        F.sum(F.col("mq") * F.col("age")).alias("qty_age_days"),
        F.max("dq").alias("dq"),
    )
    return alloc.select(
        F.col("l_partkey").alias("partkey"),
        "matched_qty",
        (F.col("dq") - F.col("matched_qty")).cast("long").alias("unmatched_qty"),
        "qty_age_days",
    )
