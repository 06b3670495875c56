#!/usr/bin/env python
"""Scale curves for the round-13 query family, to sf10, both engines.

Covers the five new round-13 queries (three silver-served sweep twins,
kNN-graph construction, unigram-LM pruning) and re-measures
cox_hazard_newton after the risk-moment fusion (the round-12 verdict's
item #3). The served twins' DuckDB column replays the ORIGINAL
raw-events oracle — that asymmetry is the point: the engine serves a
materialized silver table while the single-node baseline recomputes
the sweep, which is exactly the production trade. The one-time silver
build cost is reported separately (`silver_build_sec`).

Method matches scale_curve_r12: fresh physical plans, min of reps,
DuckDB hard interrupt at DUCK_TIMEOUT (a timeout is a data point).
Writes SCALE_CURVE_R13.json at the repo root and prints it to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_curve_r12 import (  # noqa: E402
    DIRS,
    DUCK_TIMEOUT,
    _ensure_corpora,
    _time_duck,
    _time_spark,
)

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

OPS = [
    "interval_sweep_profile_served",
    "max_concurrent_sessions_served",
    "interval_union_coverage_served",
    "knn_graph_topk",
    "unigram_lm_prune",
    "cox_hazard_newton",
]


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "ops": {},
        "silver_build_sec": {},
    }
    # One-time silver build per sf_dir, timed separately so the served
    # twins' per-query numbers are the steady-state serving cost.
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        served_boundary_segments,
    )

    for label, d, _reps in DIRS:
        if not os.path.isfile(f"{d}/events.parquet"):
            continue
        t0 = time.perf_counter()
        served_boundary_segments(spark, d).count()
        out["silver_build_sec"][label] = round(time.perf_counter() - t0, 3)
        print(f"silver build @ {label}: {out['silver_build_sec'][label]}",
              file=sys.stderr)
    for name in OPS:
        q = REGISTRY[name]
        out["ops"][name] = {}
        for label, d, reps in DIRS:
            if not os.path.isfile(f"{d}/lineitem.parquet"):
                continue
            row: dict = {}
            row["spark"] = _time_spark(lambda: q.build(spark, d), reps)
            if q.oracle:
                row["duckdb"] = _time_duck(d, q.oracle, reps)
            out["ops"][name][label] = row
            print(f"{name} @ {label}: {row}", file=sys.stderr)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R13.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
