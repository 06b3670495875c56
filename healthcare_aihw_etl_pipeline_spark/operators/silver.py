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
    table under ``$TMP/<name>/<basename(sf_dir)>/v=<src_mtime_ns>``,
    rebuilt when the source parquet is newer than the last
    materialization.

    Each source mtime gets its OWN immutable version directory: a lazy
    DataFrame handle returned before a rebuild keeps reading the
    snapshot it resolved against instead of racing the overwrite of a
    shared path (the snapshot-isolation contract a table format like
    Iceberg provides at 100 TB). The two most recent versions are
    retained; older ones are pruned, bounding temp growth while keeping
    the immediately superseded snapshot alive for in-flight handles."""
    import shutil

    from healthcare_aihw_etl_pipeline_spark.plans.registry import (
        invalidate,
        watch_path,
    )

    base = os.path.join(
        tempfile.gettempdir(), name, os.path.basename(sf_dir.rstrip("/"))
    )
    src = os.path.join(sf_dir, f"{source_table}.parquet")
    vdir = os.path.join(base, f"v={os.stat(src).st_mtime_ns}")
    success = os.path.join(vdir, "_SUCCESS")
    watch_path(sf_dir, success)
    if not os.path.exists(success):
        build().write.mode("overwrite").parquet(vdir)
        invalidate(sf_dir=sf_dir)
        try:
            versions = sorted(
                int(d[2:])
                for d in os.listdir(base)
                if d.startswith("v=") and d[2:].isdigit()
            )
            for old in versions[:-2]:
                shutil.rmtree(os.path.join(base, f"v={old}"),
                              ignore_errors=True)
        except OSError:
            pass  # pruning is best-effort housekeeping
    return spark.read.parquet(vdir)
