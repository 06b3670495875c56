"""End-to-end ETL orchestration test (offline path)."""

from __future__ import annotations

from healthcare_aihw_etl_pipeline_spark.pipeline import run_etl, year_from_url
from healthcare_aihw_etl_pipeline_spark.sources import fixtures


def test_year_from_url():
    assert year_from_url("https://x/4-apc-2022-23-tables-access.xlsx") == 2023
    assert year_from_url("https://x/no-year.xlsx") == 9999


def test_run_etl_offline(spark, tmp_path):
    tidy, staging, clean = run_etl(
        spark, str(tmp_path), sheets_override=fixtures.SHEETS
    )
    assert tidy.count() > 0
    staged = spark.read.parquet(staging)
    cleaned = spark.read.parquet(clean)
    assert staged.count() == tidy.count()
    # clean is the fill-then-group aggregate: never more rows than staging
    assert 0 < cleaned.count() <= staged.count()
    assert {"year", "state", "separations"} <= set(cleaned.columns)
