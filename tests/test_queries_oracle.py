"""Oracle-differential tests: every registered query with a DuckDB oracle
must match value-for-value (order-insensitive) — the same contract the
driver enforces at sf0.01 (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY
from tests.oracle_check import compare

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    compare(q.fn(spark, sf_dir), duck, q.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
