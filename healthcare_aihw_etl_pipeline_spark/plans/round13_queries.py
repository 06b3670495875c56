"""Round-13 query families.

- silver-served sweep twins: the three sweep-family queries served
  from a materialized boundary-delta segment table (the bronze→silver
  discipline that closed the JSON family's letter gap in round 4,
  applied per the round-12 review: the fusion A/B proved the family's
  residual vs the single-node baseline is the from-scratch
  scan→agg→window pipeline itself, so serve it once). Each twin shares
  its original's DuckDB oracle — which replays the FULL sweep from raw
  events — so a hash match proves the materialization preserved the
  sweep's semantics end-to-end.

Same contract as every plans module: idiomatic PySpark paired with a
DuckDB oracle whose arithmetic is bit-identical. Reference lineage: the
reference pipeline (/root/reference/main.py:61-78) serves grouped daily
views of admissions data from a cleaned staging table — i.e. it ALSO
computes once at ingest and serves many reads; these twins are that
discipline applied to the interval-concurrency family at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from healthcare_aihw_etl_pipeline_spark.plans.registry import REGISTRY, register

# ---------------------------------------------------------------------------
# Silver-served sweep twins
#
# The oracles are the ORIGINALS' oracles (raw-events replay), pulled
# from the registry at import time — plans/__init__ imports round11/12
# before this module. Sharing the string object means the served twin
# can never drift from the from-scratch form's contract.

_SWEEP_ORACLE = REGISTRY["interval_sweep_profile"].oracle
_MAXCC_ORACLE = REGISTRY["max_concurrent_sessions"].oracle
_UNION_ORACLE = REGISTRY["interval_union_coverage"].oracle


@register(
    "interval_sweep_profile_served",
    oracle=_SWEEP_ORACLE,
    doc="interval_sweep_profile served from the materialized "
    "boundary-delta silver table (operators.sweep."
    "served_boundary_segments): per-query cost drops from "
    "scan + (user, day) exchange + (day) window to a plain columnar "
    "scan + one (day) aggregate — the events_typed_agg bronze→silver "
    "discipline applied to the sweep family. The oracle replays the "
    "full sweep from raw events in DuckDB, so the hash match proves "
    "the silver table is faithful. The from-scratch form stays "
    "registered as the oracle path (and is what the ingest job runs).",
)
def interval_sweep_profile_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        profile_from_segments,
        served_boundary_segments,
    )

    return profile_from_segments(served_boundary_segments(spark, sf_dir))


@register(
    "max_concurrent_sessions_served",
    oracle=_MAXCC_ORACLE,
    doc="max_concurrent_sessions served from the materialized "
    "boundary-delta silver table — scan + (day) aggregate per query; "
    "oracle replays the full sweep from raw events (see "
    "interval_sweep_profile_served).",
)
def max_concurrent_sessions_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        max_concurrent_from_segments,
        served_boundary_segments,
    )

    return max_concurrent_from_segments(
        served_boundary_segments(spark, sf_dir)
    )


@register(
    "interval_union_coverage_served",
    oracle=_UNION_ORACLE,
    doc="interval_union_coverage served from the materialized "
    "boundary-delta silver table — scan + (day) aggregate per query; "
    "oracle replays the full sweep from raw events (see "
    "interval_sweep_profile_served).",
)
def interval_union_coverage_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        served_boundary_segments,
        union_coverage_from_segments,
    )

    return union_coverage_from_segments(
        served_boundary_segments(spark, sf_dir)
    )
