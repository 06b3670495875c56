#!/usr/bin/env python
"""Round-16 scale curves: ONE quiet-host same-run re-pair of the
ENTIRE standing >2x ledger (the r15 verdict's #1 ask — half of such a
ledger evaporated on fresh pairs in r14, and dup_span_stats re-rated
1.08x -> 2.0x the other way, so letters must reflect code, not host
history), plus the three data-proportional residues whose PLANS
changed this round (assoc_rules lazy-persist pipeline, dup_span
adaptive one-pass, minhash_verified single band self-join).

Covers all 24 weak names in their three VERDICT classes, pairing each
raw form with its served twin where one exists (the served ratio is
the committed scale answer for that class). Same-run method of
scale_curve_r12: fresh physical plans, min over reps, DuckDB hard
interrupt + memory cap — a timeout or an OOM is a data point.

Run on a QUIET host (nothing else on the 32 cores).
Writes SCALE_CURVE_R16.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_curve_r12 import (  # noqa: E402
    DUCK_TIMEOUT,
    _ensure_corpora,
    _time_spark,
)

# The verdict's ask is same-run sf1+sf10 pairs for the weak ledger —
# the two scales the letters are graded at (sf0.01/sf0.1 stay covered
# by the bench + correctness sweeps).
DIRS = [
    ("sf1", "/tmp/sfbench/sf1", 2),
    ("sf10", "/tmp/sfbench/sf10", 1),
]
from scale_curve_r14b import DUCK_MEM, _time_duck_capped  # noqa: E402

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

# The full standing >2x ledger (VERDICT r15 "weak by the letter"),
# each raw form immediately followed by its served twin where one
# exists so the pair shares one host window.
SERVED_TWIN_RAW = [
    "interval_sweep_profile",
    "interval_sweep_profile_served",
    "max_concurrent_sessions",
    "max_concurrent_sessions_served",
    "interval_union_coverage",
    "interval_union_coverage_served",
    "kaplan_meier_conversion",
    "kaplan_meier_conversion_served",
    "nelson_aalen_hazard",
    "nelson_aalen_hazard_served",
    "cox_hazard_newton",
    "cox_hazard_newton_served",
    "logrank_arm_test",
    "logrank_arm_test_served",
    "zipf_slope_tokens",
    "zipf_slope_tokens_served",
    "ams_f2_tokens",
    "ams_f2_tokens_served",
    "token_shard_plan",
    "token_shard_plan_served",
    "asof_purchase_lag",
    "asof_purchase_lag_served",
]
FLOOR_FLATS = [
    "t_closeness_audit",
    "t_closeness_audit_served",
    "bh_fdr_nation_tests",
    "roc_auc_order_age",
    "markov_attribution",
    "ucb1_daily_choice",
    "grid_density_clusters",
    "logistic_newton_step",
    "did_order_value",
    "largest_remainder_allocation",
    "rdd_order_value",
]
DATA_PROPORTIONAL = [
    "assoc_rules_top20",
    "dup_span_stats",
    "minhash_verified_dup_clusters_portable",
    "minhash_verified_dup_clusters",
]
OPS = SERVED_TWIN_RAW + FLOOR_FLATS + DATA_PROPORTIONAL


def main() -> None:
    only = None
    if "--ops" in sys.argv:
        only = sys.argv[sys.argv.index("--ops") + 1].split(",")
    _ensure_corpora()
    spark = get_spark()
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "duck_memory_limit": DUCK_MEM,
        "ops": {},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R16.json",
    )
    if os.path.exists(path):
        with open(path) as fh:
            out["ops"].update(json.load(fh).get("ops", {}))
    for name in OPS:
        if only and name not in only:
            continue
        q = REGISTRY[name]
        out["ops"][name] = {}
        for label, d, reps in DIRS:
            if not os.path.isfile(f"{d}/lineitem.parquet"):
                continue
            row: dict = {}
            row["spark"] = _time_spark(lambda: q.build(spark, d), reps)
            if q.oracle:
                row["duckdb"] = _time_duck_capped(d, q.oracle, reps)
            out["ops"][name][label] = row
            print(f"{name} @ {label}: {row}", file=sys.stderr, flush=True)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps({"ops": list(out["ops"])}))


if __name__ == "__main__":
    main()
