#!/usr/bin/env python
"""Scale curves for the round-13 continuation work, both engines.

Covers (a) the five new statistics families (KS two-sample, Brier
decomposition, Zipf fit, JL projection, SPRT), (b) the survival trio
after the shared-operator + footer-statistics-horizon refactor, and
(c) the re-measured old perf-letter residues (token_shard_plan after
its scan-once checkpoint, twap_event_value, skyline_orders,
asof_purchase_lag) — all paired against DuckDB on identical oracle SQL
over the SAME freshly generated corpus, because the r6/r13 lesson is
that corpus layout moves both engines: only same-run pairs are
comparable across rounds.

Method matches scale_curve_r12 (fresh physical plans, min of reps,
DuckDB hard interrupt). Writes SCALE_CURVE_R13B.json at the repo root.
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

OPS = [
    # new this session
    "ks_two_sample_value",
    "brier_decomposition",
    "zipf_slope_tokens",
    "jl_projection_top10",
    "sprt_ab_decision",
    "ams_f2_tokens",
    "woe_iv_segments",
    # survival trio on the shared operator + footer horizon
    "kaplan_meier_conversion",
    "nelson_aalen_hazard",
    "cox_hazard_newton",
    "kaplan_meier_conversion_served",
    "nelson_aalen_hazard_served",
    "cox_hazard_newton_served",
    "zipf_slope_tokens_served",
    "ams_f2_tokens_served",
    "lpa_communities_top20",
    "did_order_value",
    "ucb1_daily_choice",
    "kcenter_coreset_seeds",
    "logrank_arm_test",
    "ipw_ate_order_value",
    # old letter residues, re-measured same-run
    "token_shard_plan",
    "token_shard_plan_served",
    "twap_event_value",
    "cdc_chunk_stats",
    "skyline_orders",
    "asof_purchase_lag",
]


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "ops": {},
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
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R13B.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
