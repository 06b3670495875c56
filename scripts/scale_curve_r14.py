#!/usr/bin/env python
"""Round-14 scale curves: the stale >2x carryover ledger re-measured
same-run, plus the round's plan changes and new queries.

The round-13 lesson (twap_event_value 3.9x -> 1.01x, skyline_orders
2.7x -> 0.73x on re-measurement) is that corpus layout and run variance
move BOTH engines: only same-run fresh-corpus pairs are comparable.
This script therefore re-measures, against DuckDB on identical oracle
SQL over the SAME freshly generated corpus:

(a) every stale >2x carryover from the r11/r12 ledgers
    (t_closeness_audit, roc_auc_order_age, logistic_newton_step,
    grid_density_clusters, largest_remainder_allocation,
    hybrid_rrf_fusion_top10, winnow_shared_fingerprints,
    event_trigram_patterns, the three raw sweep forms);
(b) the round-14 plan change (asof_purchase_lag on the single-scan
    self-as-of) and new queries (logrank_arm_test_served,
    graph_ann_top10);
(c) the floor-class flats, with a per-query floor/marginal
    decomposition: with t(sf) = floor + marginal(sf) and marginal
    linear in data size, marginal(sf10) ~= (t(sf10) - t(sf1)) * 10/9
    and floor = t(sf10) - marginal — bench.py's decade-smaller split
    applied at the TOP of the curve, so the ledger separates Spark's
    fixed per-query floor from actual compute.

Method matches scale_curve_r12: fresh physical plans, min of reps,
DuckDB hard interrupt (a timeout is a data point). Writes
SCALE_CURVE_R14.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys

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

# (a) stale >2x carryovers from r11/r12 measurements
STALE = [
    "t_closeness_audit",
    "roc_auc_order_age",
    "logistic_newton_step",
    "grid_density_clusters",
    "largest_remainder_allocation",
    "hybrid_rrf_fusion_top10",
    "winnow_shared_fingerprints",
    "winnow_shared_fingerprints_fast",
    "event_trigram_patterns",
    "interval_sweep_profile",
    "max_concurrent_sessions",
    "interval_union_coverage",
]
# (b) round-14 plan changes and additions
NEW = [
    "asof_purchase_lag",
    "logrank_arm_test",
    "logrank_arm_test_served",
    "graph_ann_top10",
]
# (c) floor-class flats: full curve + sf1->sf10 floor/marginal split
FLOOR_CLASS = [
    "ks_two_sample_value",
    "did_order_value",
    "ucb1_daily_choice",
    "sprt_ab_decision",
    "woe_iv_segments",
    "largest_remainder_allocation",
]

OPS = list(dict.fromkeys(STALE + NEW + FLOOR_CLASS))


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "ops": {},
        "floor_split_sf10": {},
    }
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
            print(f"{name} @ {label}: {row}", file=sys.stderr, flush=True)
    # Floor/marginal split at the top of the curve: decade-smaller
    # two-point model between sf1 and sf10 (same run, same corpus).
    for name in FLOOR_CLASS:
        curve = out["ops"].get(name, {})
        t10 = curve.get("sf10", {}).get("spark")
        t1 = curve.get("sf1", {}).get("spark")
        if not isinstance(t10, (int, float)) or not isinstance(
            t1, (int, float)
        ):
            continue
        marginal = max((t10 - t1) * 10.0 / 9.0, 0.0)
        entry = {
            "spark_sf10": t10,
            "spark_sf1": t1,
            "marginal_sf10": round(marginal, 3),
            "floor": round(max(t10 - marginal, 0.0), 3),
        }
        d10 = curve.get("sf10", {}).get("duckdb")
        if isinstance(d10, (int, float)):
            entry["duckdb_sf10"] = d10
            entry["marginal_vs_duckdb"] = (
                round(marginal / d10, 2) if d10 > 0 else None
            )
        out["floor_split_sf10"][name] = entry
        print(f"floor_split {name}: {entry}", file=sys.stderr, flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R14.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
