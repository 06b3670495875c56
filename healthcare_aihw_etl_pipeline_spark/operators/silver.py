"""Shared bronze→silver serving scaffold.

Every served silver table in this engine follows the same contract
(established by operators/sweep.served_boundary_segments, extended in
round 13 to token statistics, export sharding and the survival span
relation): materialize a derived relation once per scale-factor
directory under the system temp root, key freshness on the SOURCE
parquet's mtime, register the _SUCCESS marker with the plan-cache
staleness watcher, and invalidate prepared plans when rebuilding. At
100 TB the materialization is the ingest job; here the scaffold is the
cache that stands in for it. One implementation, four tables — a fix
to the staleness compare or the path key lands once.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def serve_silver(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    source_table: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Serve `build()`'s relation from a materialized parquet silver
    table under ``$TMP/<name>/<basename(sf_dir)>``, rebuilt when the
    source parquet is newer than the last materialization."""
    from healthcare_aihw_etl_pipeline_spark.plans.registry import (
        invalidate,
        watch_path,
    )

    base = os.path.join(
        tempfile.gettempdir(), name, os.path.basename(sf_dir.rstrip("/"))
    )
    src = os.path.join(sf_dir, f"{source_table}.parquet")
    success = os.path.join(base, "_SUCCESS")
    watch_path(sf_dir, success)
    if not os.path.exists(success) or os.path.getmtime(
        success
    ) < os.path.getmtime(src):
        build().write.mode("overwrite").parquet(base)
        invalidate(sf_dir=sf_dir)
    return spark.read.parquet(base)
