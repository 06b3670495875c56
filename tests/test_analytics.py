"""Dashboard-serving layer tests (SURVEY §3.2): insights, widget
aggregations, interactive filters, and the cube serving pass — over the
reference-shaped fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans import analytics
from healthcare_aihw_etl_pipeline_spark.sources import fixtures
from healthcare_aihw_etl_pipeline_spark.sources.sheet_ingest import (
    clean_aggregate,
    compile_sheets,
)


@pytest.fixture(scope="module")
def admissions(spark):
    tidy = compile_sheets(spark, fixtures.SHEETS)
    return analytics.serve(analytics.harmonize(clean_aggregate(tidy)))


def test_harmonize_renames(spark):
    df = spark.createDataFrame(
        [(2022, "NSW", "A00", "Infect", 5.0)],
        ["year", "state", "diagnosis", "icd_chapter", "separations"],
    )
    out = analytics.harmonize(df)
    assert "principal_diagnosis" in out.columns and "category" in out.columns


def test_insights_values(admissions):
    ins = analytics.generate_insights(admissions)
    assert ins is not None
    # manual argmax over state totals
    totals = {
        r.state: r.separations for r in analytics.state_bar(admissions).collect()
    }
    assert ins.top_state == max(totals, key=lambda s: (totals[s], s))
    assert ins.top_state_total == totals[ins.top_state]
    assert ins.first_year == 2022 and ins.last_year == 2023
    assert ins.pct_change is not None
    assert len(ins.lines()) == 3


def test_insights_empty_guard(admissions):
    assert analytics.generate_insights(admissions.where("year = 1900")) is None


def test_widget_shapes(admissions):
    heat = analytics.category_state_heatmap(admissions)
    assert heat.columns[0] == "category"
    assert set(heat.columns[1:]) == set(
        ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT", "AUST"]
    )
    top = analytics.category_top10(admissions).collect()
    assert len(top) <= 10
    vals = [r.separations for r in top]
    assert vals == sorted(vals, reverse=True)
    tm = analytics.treemap(admissions)
    assert set(tm.columns) == {"category", "principal_diagnosis", "separations"}


def test_widget_cube_serves_all_grains(admissions):
    cube = analytics.widget_cube(admissions).collect()
    # grand total grain (everything null) equals the full sum
    total = admissions.agg(F.sum("separations")).first()[0]
    grand = [r for r in cube if r.year is None and r.state is None and r.category is None]
    assert len(grand) == 1 and grand[0].separations == total
    # state grain matches the A6 widget
    by_state = {
        r.state: r.separations
        for r in cube
        if r.state is not None and r.year is None and r.category is None
    }
    want = {r.state: r.separations for r in analytics.state_bar(admissions).collect()}
    assert by_state == want


def test_interactive_filter_semantics(admissions):
    domains = analytics.filter_domains(admissions)
    assert set(domains["state"]) >= {"NSW", "VIC", "QLD"}
    # selection == full domain → no-op for dynamic dims (F6)
    full = analytics.interactive_filter(
        admissions, {"category": domains.get("category", [])}
    )
    assert full.count() == admissions.count()
    # year IN-list applies
    only_2022 = analytics.interactive_filter(admissions, {"year": [2022]})
    assert only_2022.select("year").distinct().collect()[0][0] == 2022
    assert only_2022.count() < admissions.count()


def test_profile(admissions):
    prof = {r.column: r for r in analytics.profile(admissions).collect()}
    assert set(prof) == set(admissions.columns)
    total = admissions.count()
    for r in prof.values():
        assert r.n_non_null + r.n_null == total
    sep = prof["separations"]
    assert float(sep.min_value) >= 0
    assert float(sep.max_value) >= float(sep.min_value)
    assert sep.mean_value is not None
    assert prof["state"].mean_value is None  # non-numeric: no mean


def test_domains_gate_high_cardinality(spark):
    """_domains_one_pass pre-gate: a dim with ~1e6 distinct values must
    NOT go through collect_set (whose partial-aggregation buffers hold
    the full domain); it is routed to a spill-safe distinct+limit and
    still returns the first `cap` values in sort order — the same
    contract as the collect_set path."""
    df = spark.range(1_000_000).select(
        F.format_string("u%07d", F.col("id")).alias("user_key"),
        (F.col("id") % 3).cast("int").alias("tiny_dim"),
    )

    def guarded(c):
        return F.col(c)

    over = analytics._gate_over_cap(df, ["user_key", "tiny_dim"], 50, guarded)
    assert over == {"user_key"}

    domains = analytics._domains_one_pass(df, ["user_key", "tiny_dim"], cap=50)
    # high-card column: exactly cap values (signals "domain >= cap"),
    # and they are the sort-order head, matching sort_array semantics
    assert domains["user_key"] == [f"u{i:07d}" for i in range(50)]
    assert domains["tiny_dim"] == [0, 1, 2]


def test_domains_gate_agrees_with_ungated(spark):
    """Both paths return identical domains on a column near the gate
    boundary, so gating can never change the cardinality-guard verdict."""
    df = spark.range(200).select(
        F.format_string("v%03d", F.col("id") % 120).alias("c")
    )
    # cap=50: 120 distinct > 1.3*50 -> gated; head-of-sort-order slice
    gated = analytics._domains_one_pass(df, ["c"], cap=50)
    assert gated["c"] == [f"v{i:03d}" for i in range(50)]
    # cap=200: 120 < 1.3*200 -> collect_set path, full domain
    ungated = analytics._domains_one_pass(df, ["c"], cap=200)
    assert ungated["c"] == [f"v{i:03d}" for i in range(120)]
