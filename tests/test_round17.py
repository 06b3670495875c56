"""Round 17 (optimization round 2): gate/fallback coverage.

The r16 verdict asked for every driver-side bounded-collect rewrite to
keep a distributed fallback and for that path selection to be tested:
markov_attribution (item 4), theil_sen_daily_trend (item 8), plus the
ADVICE items (BPE vocab-size bound, kmeans non-finite centroid
literals). Each test forces the gate by shrinking the threshold and
pins the fallback's rows against the default path's rows.
"""
from __future__ import annotations

import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _fresh(name):
    """The UNCACHED constructor: q.fn is the plan-cached wrapper, so a
    monkeypatched gate would never re-run through it."""
    q = REGISTRY[name]
    return q.build or q.fn


def test_markov_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round14b_queries as m

    fast = _rows(_fresh("markov_attribution")(spark, sf_dir))
    # Force the gate: a 0-cell budget sends every corpus down the
    # distributed removal-effect plan.
    monkeypatch.setattr(m, "_MK_MAX_CELLS", 0)
    slow = _rows(_fresh("markov_attribution")(spark, sf_dir))
    assert slow == fast


def test_theil_sen_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round11b_queries as m

    fast = _rows(_fresh("theil_sen_daily_trend")(spark, sf_dir))
    monkeypatch.setattr(m, "_TS_MAX_DAYS", 1)
    slow = _rows(_fresh("theil_sen_daily_trend")(spark, sf_dir))
    assert slow == fast


def test_theil_sen_overflow_guard_raises(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round11b_queries as m

    # A quantum large enough that max|dy| * Q exceeds int64 must raise
    # loudly (ANSI-Spark-like) instead of wrapping silently in numpy.
    monkeypatch.setattr(m, "_TS_SLOPE_QUANT", 2**63)
    with pytest.raises(ArithmeticError, match="int64"):
        _fresh("theil_sen_daily_trend")(spark, sf_dir).collect()


def test_bpe_vocab_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round12_queries as m

    fast = m._bpe_train(spark, sf_dir)
    # Force the vocab bound: a 0-row budget must select the Spark
    # merge loop even though the doc-count footer gate passes.
    monkeypatch.setattr(m, "_BPE_MAX_VOCAB", 0)
    slow = m._bpe_train(spark, sf_dir)
    assert slow == fast


def test_graph_ann_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round14_queries as m

    fast = _rows(_fresh("graph_ann_top10")(spark, sf_dir))
    # Force the gate: the distributed index build + hop loop must
    # produce bit-identical ranks/ids/dots.
    monkeypatch.setattr(m, "_GA_MAX_DRIVER_ROWS", -1)
    slow = _rows(_fresh("graph_ann_top10")(spark, sf_dir))
    assert slow == fast


def test_kcenter_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round13b_queries as m

    fast = _rows(_fresh("kcenter_coreset_seeds")(spark, sf_dir))
    # Force the gate: the carried-dmin Arrow path must select the
    # same centers and radii as the literal-chain path.
    monkeypatch.setattr(m, "_KC_MAX_DRIVER_ROWS", -1)
    slow = _rows(_fresh("kcenter_coreset_seeds")(spark, sf_dir))
    assert slow == fast


def test_unigram_gate_fallback_matches(spark, sf_dir, monkeypatch):
    import healthcare_aihw_etl_pipeline_spark.plans.round13_queries as m

    fast = _rows(_fresh("unigram_lm_prune")(spark, sf_dir))
    # Force the vocab probe over the gate: the original Spark pipeline
    # (checkpoint + model collect + Arrow Viterbi) must match.
    monkeypatch.setattr(m, "_UNI_MAX_VOCAB", 0)
    slow = _rows(_fresh("unigram_lm_prune")(spark, sf_dir))
    assert slow == fast


def test_sweep_bucketed_equals_legacy(spark, sf_dir):
    """The r17 two-level (sub-bucketed) sweep must produce the exact
    segment relation of the single-window plan — running counts, gaps,
    durations, all of it — on every consumer."""
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        daily_boundary_segments,
        max_concurrent_from_segments,
        profile_from_segments,
        union_coverage_from_segments,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    legacy = daily_boundary_segments(ev, 1)  # under the gate
    bucketed = daily_boundary_segments(ev, None)  # over (scale-safe)
    cols = ["day", "t", "d", "dur", "running", "gap_us"]
    a = sorted(map(tuple, legacy.select(cols).collect()))
    b = sorted(map(tuple, bucketed.select(cols).collect()))
    assert a == b
    for agg in (
        union_coverage_from_segments,
        max_concurrent_from_segments,
        profile_from_segments,
    ):
        assert _rows(agg(legacy)) == _rows(agg(bucketed)), agg.__name__


def test_km_dlit_literals(spark):
    from healthcare_aihw_etl_pipeline_spark.plans.round11_queries import (
        _km_dlit,
    )

    # Finite: shortest-round-trip repr double literal.
    assert _km_dlit(1.5) == "1.5D"
    # Non-finite: parseable CAST literals (repr would emit 'nanD').
    import math

    from pyspark.sql import functions as F

    vals = [float("nan"), float("inf"), float("-inf"), 0.1]
    exprs = ", ".join(_km_dlit(v) for v in vals)
    got = spark.range(1).select(
        F.expr(f"array({exprs})").alias("a")
    ).collect()[0]["a"]
    assert math.isnan(got[0])
    assert got[1] == float("inf") and got[2] == float("-inf")
    assert got[3] == 0.1
