"""Round-13 tests: the silver-served sweep twins must be column-exact
equal to their from-scratch forms (the materialization cannot change a
single value), and the silver table must rebuild when the source
events parquet is newer than the materialization."""

import os
import time

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

_PAIRS = [
    ("interval_sweep_profile_served", "interval_sweep_profile"),
    ("max_concurrent_sessions_served", "max_concurrent_sessions"),
    ("interval_union_coverage_served", "interval_union_coverage"),
]


def _collect(spark, name):
    df = REGISTRY[name].build(spark, SF)
    return df.columns, sorted(map(tuple, df.collect()))


def test_served_twins_match_from_scratch(spark):
    for served, original in _PAIRS:
        sc, sr = _collect(spark, served)
        oc, orows = _collect(spark, original)
        assert sc == oc, (served, sc, oc)
        assert sr == orows, served


def test_served_segments_rebuild_on_stale_source(spark, tmp_path):
    import shutil
    import tempfile

    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        served_boundary_segments,
    )

    # Work on a COPY of the sf0.001 corpus (testdata is read-only to us)
    # so touching the source's mtime is safe.
    sf = tmp_path / "sf_copy"
    sf.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), sf / "events.parquet")
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_sweep_segments", "sf_copy"
    )
    served_boundary_segments(spark, str(sf)).collect()
    success = os.path.join(base, "_SUCCESS")
    assert os.path.exists(success)
    first = os.path.getmtime(success)
    # Source newer than the materialization -> rebuild on next access.
    future = time.time() + 60
    os.utime(sf / "events.parquet", (future, future))
    served_boundary_segments(spark, str(sf)).collect()
    assert os.path.getmtime(success) > first
