"""bench.py stdout-contract guard: the consumer keeps only a ~2000-char
tail of stdout and parses the LAST line, so the headline JSON must stay
under the limit — and an overflow must degrade to a minimal parseable
line, never to silence."""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import stdout_line  # noqa: E402


def test_short_line_passes_through():
    out = {"metric": "headline_query_wall_sec", "value": 1.0, "queries": {"q1": 0.5}}
    line = stdout_line(out)
    assert json.loads(line) == out


def test_overflow_drops_queries_but_stays_parseable(capsys):
    out = {
        "metric": "headline_query_wall_sec",
        "value": 1.0,
        "sf": 0.1,
        "queries": {f"q{i}": 0.123456 for i in range(400)},
    }
    assert len(json.dumps(out)) >= 1900  # the guard must actually fire
    line = stdout_line(out)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_sec"
    assert parsed["value"] == 1.0
    assert "queries" not in parsed
    # the overflow is reported on stderr, not swallowed
    assert "too long" in capsys.readouterr().err


def test_wave_runs_and_is_positive(spark, sf_dir):
    """The concurrent suite-wall path (bench._wave): pre-resolved plans
    collected from a thread pool must complete and return sane
    timings at any sf_dir."""
    import bench

    wave_min, wave_med, samples = bench._wave(spark, sf_dir, reps=2)
    assert 0 < wave_min <= wave_med
    assert len(samples) == 2 and abs(min(samples) - wave_min) < 1e-3


def test_bench_stdout_line_under_limit_with_current_shape():
    """The real stdout shape (13-query dict + both-engine scalars + the
    sf1 block) must stay under the consumer's tail buffer."""
    out = {
        "metric": "headline_suite_wall_sec", "value": 0.55, "unit": "sec",
        "queries": {f"some_query_name_{i:02d}": 0.1234 for i in range(13)},
        "sf": 0.1, "value_seq": 2.25, "value_wave_med": 0.66,
        "exec_total": 0.34, "cold_total": 4.38, "sched_floor_ms": 36.4,
        "value_med": 2.54, "noise_floor": [0.177, 0.1443],
        "duckdb_total": 1.2425, "duckdb_wave": 0.4612,
        "sf1": {"wall": 2.31, "wall_med": 2.84, "seq": 4.49,
                "duckdb": 2.65, "duckdb_wave": 1.02},
        "floor_total": 0.92, "marginal_total": 1.32,
    }
    import json as _json

    from bench import stdout_line

    line = stdout_line(out)
    assert _json.loads(line)["metric"] == "headline_suite_wall_sec"
    assert "queries" in _json.loads(line)


def test_collect_wave_matches_sequential(spark, sf_dir):
    """The serving-layer wave (plans/serving.py) returns exactly the
    rows each query returns sequentially — concurrency must not change
    results — and unknown names / failing queries surface by name."""
    import pytest

    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY
    from healthcare_aihw_etl_pipeline_spark.plans.serving import collect_wave

    names = ["revenue_by_nation", "pricing_summary", "top_nation",
             "filter_in_agg", "distinct_event_types"]
    wave = collect_wave(spark, names, sf_dir, fresh_plans=True)
    for n in names:
        seq = REGISTRY[n].fn(spark, sf_dir).collect()
        assert sorted(map(tuple, wave[n])) == sorted(map(tuple, seq)), n

    with pytest.raises(KeyError):
        collect_wave(spark, ["no_such_query"], sf_dir)

    # Degenerate inputs: empty wave is {}, and an explicit
    # max_workers=0 clamps to one worker rather than crashing the pool.
    assert collect_wave(spark, [], sf_dir) == {}
    one = collect_wave(spark, ["top_nation"], sf_dir, max_workers=0)
    assert list(one) == ["top_nation"]


# Cold-cost ceiling per registry query at the test SF. The full-registry
# sweep (driver_sim / CORRECTNESS_FULL artifacts) runs every query; a
# single quadratic-cost addition would silently make that sweep
# minutes-expensive. The absolute ceiling was chosen "~10x above the
# worst honest query" when that worst was <1 s; by round 15 the worst
# honest cold costs (markov's unrolled removal rounds, bpe's merge
# loop) reached ~5-8 s on a quiet host, so on a noisy host the fixed
# bound flakes — round 16 measured the SAME test failing on the r15
# commit with a different offender set per run while the sweep wall
# itself swung 313 s ↔ 578 s. The guard is therefore noise-normalized:
# the effective ceiling scales with the same-sweep MEDIAN query cost
# (host slowness inflates numerator and denominator together, so the
# relative bound is noise-immune), floored at the absolute ceiling so
# a quiet host keeps the historical bar. A runaway quadratic addition
# (minutes at sf0.001, >>40x the median) still trips either form.
_COLD_CEILING_SEC = 8.0
_MEDIAN_MULT = 25.0  # worst honest query ≈ 16x median on a quiet host
# Documented allowlist (higher ceiling): the transactional-DML
# snapshots run a multi-commit write workload (append/merge/delete/
# update/compact round trips) on FIRST touch by design — their cost is
# the storage engine's, not a query plan regression.
_SWEEP_ALLOWLIST = {
    "txlog_delete_update_snapshot": 60.0,
    "ivm_join_snapshot": 60.0,
    "ivm_full_outer_snapshot": 90.0,  # full-outer: both-sides recon DML
    "audio_pcm_features": 20.0,  # encodes+decodes a WAV per document
    "zorder_layout_stats": 30.0,  # writes + re-reads a clustered layout
    "scd2_user_tier_history": 30.0,  # maintains a txlog dimension table
    "scd2_temporal_join": 30.0,
    # First touch parses the Excel fixture driver-side AND writes the
    # staging+clean two-tier tables — a storage workload by design
    # (measured 8-10 s cold on the round-11 host, 2.3 s warm).
    "ingest_clean_admissions": 20.0,
}


def _sweep_cost_guard(spark, sf_dir, names):
    """Shared body of the sweep-cost guards: build each named query
    FROM SCRATCH (cache bypassed), time build+collect, apply the
    noise-normalized ceiling, fail with the offender list."""
    import time

    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    took_by_name = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        (q.build or q.fn)(spark, sf_dir).collect()
        took_by_name[name] = time.perf_counter() - t0
    # Noise normalization: the effective ceiling scales with this
    # sweep's median query cost (see the module comment), floored at
    # the absolute ceiling so a quiet host keeps the historical bar.
    med = sorted(took_by_name.values())[len(took_by_name) // 2]
    base = max(_COLD_CEILING_SEC, _MEDIAN_MULT * med)
    slow = {}
    for name, took in took_by_name.items():
        # Allowlist entries are FLOORS on top of the noise-scaled base,
        # not fixed caps: on a host noisy enough that the base exceeds
        # an allowlist value, the storage workloads get the same noise
        # headroom as everything else (r16 ADVICE).
        ceiling = max(_SWEEP_ALLOWLIST.get(name, 0.0), base)
        if took > ceiling:
            # Two retries, take the min: an over-ceiling reading in a
            # 200+-query sequential sweep is routinely host noise
            # (GC pause, hypervisor steal, page-cache eviction). A real
            # plan regression is reproducible and fails every run.
            q = REGISTRY[name]
            for _ in range(2):
                t0 = time.perf_counter()
                (q.build or q.fn)(spark, sf_dir).collect()
                took = min(took, time.perf_counter() - t0)
        if took > ceiling:
            slow[name] = round(took, 2)
    assert not slow, (
        f"queries above the sweep-cost ceiling at {sf_dir}: {slow} "
        f"(median {med:.2f}s, effective base ceiling {base:.1f}s; raise "
        "the documented allowlist only for deliberate storage-engine "
        "workloads, never for plan regressions)"
    )


@pytest.mark.slow
def test_registry_sweep_cost_guard(spark, sf_dir):
    """FULL-registry sweep-cost guard (~4-10 min at sf0.001): every
    query under its cold-cost ceiling. Slow-marked (r16 verdict item
    2) — the driver-window default runs the stratified sample below;
    builder scripts / CI opt in with SPARK_GRAFT_SLOW_TESTS=1."""
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    _sweep_cost_guard(spark, sf_dir, list(REGISTRY))


def test_registry_sweep_cost_guard_sampled(spark, sf_dir):
    """Fast default-path sweep guard: a DETERMINISTIC stratified
    sample — every 6th registry query (registration order, so every
    family is hit) plus the historical worst-cold-cost offenders —
    under the same noise-normalized ceiling. Keeps the cost guard's
    bite inside the driver's pytest window; the full sweep runs under
    the slow marker."""
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    names = list(REGISTRY)
    sample = names[::6]
    # The registry's historical cold-cost tail: the r16/r17 rewrites
    # (a regression in any of these is exactly what the guard exists
    # to catch) plus the storage-engine allowlist entries.
    watch = [
        "markov_attribution", "bpe_merge_training", "bpe_encode_stats",
        "theil_sen_daily_trend", "kmeans_refine_clusters",
        "unigram_lm_prune", "kcenter_coreset_seeds", "graph_ann_top10",
        "hybrid_rrf_fusion_top10", "minhash_verified_dup_clusters",
        "session_pattern_match", "golden_record_customers",
    ]
    sample += [n for n in watch if n in REGISTRY and n not in sample]
    _sweep_cost_guard(spark, sf_dir, sample)
