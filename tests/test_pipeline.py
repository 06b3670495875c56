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


def test_full_dashboard_journey(spark, tmp_path):
    """The complete reference user journey (SURVEY §3): run the ETL, read
    the clean table back from storage, serve it, and drive every dashboard
    widget + the insight generator — the switch-over path for a reference
    user."""
    from healthcare_aihw_etl_pipeline_spark.plans import analytics

    _, _, clean_path = run_etl(spark, str(tmp_path), sheets_override=fixtures.SHEETS)

    base = analytics.serve(analytics.harmonize(spark.read.parquet(clean_path)))
    domains = analytics.filter_domains(base)
    filtered = analytics.interactive_filter(base, {"state": ["NSW", "VIC", "QLD"]})

    assert analytics.state_bar(filtered).count() <= 3
    assert analytics.year_trend(filtered).count() > 0
    assert analytics.category_top10(filtered).count() > 0
    heat = analytics.category_state_heatmap(filtered)
    assert "NSW" in heat.columns
    assert analytics.treemap(filtered).count() > 0

    ins = analytics.generate_insights(filtered)
    assert ins is not None and ins.top_state in {"NSW", "VIC", "QLD"}
    assert len(ins.lines()) >= 2

    prof = analytics.profile(filtered)
    assert prof.count() == len(filtered.columns)
    assert "year" in domains and "state" in domains
    base.unpersist()
