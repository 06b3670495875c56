"""Shared event-history (survival) duration relation.

The Kaplan-Meier, Nelson-Aalen and Cox queries all reduce the event
stream to the same subject relation — one row per signed-up user with
their right-censored signup→purchase duration — before their
estimator-specific math on the calendar-bounded duration grain. One
operator, so the three estimators cannot drift (the sweep-family
`*_from_segments` lesson), and every scan-count decision lives in one
place:

- TWO fact scans, each aggregating to user grain map-side before its
  exchange (shuffled volume is |users|, not |events|). A single-scan
  user-window variant was measured (1.81 s vs 2.03 s at sf10 —
  noise-level locally) and REJECTED: WindowExec shuffles the full
  event stream with no partial aggregation, the wrong trade at 100 TB.
- The corpus horizon comes from parquet footer statistics
  (sources.catalog.events_horizon_us — exact for INT64 timestamps, ==
  the oracle's MAX(ts) by construction), spliced as a TIMESTAMP_NTZ
  literal: a metadata read replaces what used to be a third full fact
  scan. Fallback when stats are absent: the aggregate scan, broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.sources.catalog import (
    events_horizon_us,
    load_table,
)

DAY_US = 86_400_000_000


def _user_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, s_ts, p_ts) — first signup + first qualifying
    purchase per user, built from scratch (two fact scans)."""
    ev = load_table(spark, sf_dir, "events")
    # The signup relation feeds BOTH the purchase-qualification join
    # and the left side of the censoring join; materialize it once
    # (eager localCheckpoint — |signup users| slim rows, 16 bytes
    # each) so the signup fact scan runs exactly once. Exchange reuse
    # does NOT cover this: under AQE the small side becomes two
    # independent broadcast builds, each re-running the scan. The
    # trade is the unigram/DSIR scan-once discipline — a bounded
    # user-grain materialization beats re-scanning the fact table.
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return s.join(p, "user_id", "left")


def served_user_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`_user_spans` SERVED from a materialized silver table
    (bronze → silver, the served_boundary_segments discipline). The
    span relation is HORIZON-INDEPENDENT — censoring applies at serve
    time with the footer-statistics horizon — so one ingest-time
    materialization serves every survival estimator against the same
    events snapshot; per-query cost drops from two fact scans + two
    user-grain exchanges to a slim columnar scan. mtime-keyed per
    sf_dir; the from-scratch form stays the oracle path."""
    from healthcare_aihw_etl_pipeline_spark.operators.silver import serve_silver

    return serve_silver(
        spark,
        sf_dir,
        "spark_graft_user_spans",
        "events",
        lambda: _user_spans(spark, sf_dir),
    )


def signup_purchase_durations(
    spark: SparkSession,
    sf_dir: str,
    *,
    extra: dict[str, object] | None = None,
    served: bool = False,
) -> DataFrame:
    """(evt, dur[, *extra]) — one row per user with a signup event:
    evt = 1 when a purchase at-or-after the first signup exists (else
    right-censored at the corpus horizon), dur = whole days from first
    signup to first qualifying purchase (or horizon). `extra` adds
    named columns evaluated on the joined user relation (e.g. the Cox
    treatment arm ``{"x": F.col("user_id") % 2}``). With ``served``
    the span relation reads from the :func:`served_user_spans` silver
    table instead of the fact scans."""
    joined = (
        served_user_spans(spark, sf_dir)
        if served
        else _user_spans(spark, sf_dir)
    )
    hz = events_horizon_us(sf_dir)
    if hz is not None:
        href = f"TIMESTAMP_NTZ '{hz.isoformat(sep=' ')}'"
    else:
        ev = load_table(spark, sf_dir, "events")
        joined = joined.crossJoin(
            F.broadcast(ev.agg(F.max("ts").alias("horizon")))
        )
        href = "horizon"
    cols = [
        F.when(F.col("p_ts").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("evt"),
        F.expr(
            f"timestampdiff(MICROSECOND, s_ts, coalesce(p_ts, {href}))"
            f" div {DAY_US}"
        ).alias("dur"),
    ]
    for name, col in (extra or {}).items():
        cols.append((col if not isinstance(col, str) else F.col(col)).alias(name))
    return joined.select(*cols)
