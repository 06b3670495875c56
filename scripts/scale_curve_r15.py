#!/usr/bin/env python
"""Round-15 scale curves: the queries whose PLANS changed this round
(assoc_rules apriori prune + orderkey checkpoint; graph-ANN edge
symmetrization; the conditional ensure_min_splits in dup_span /
simhash_wide) plus the new families (served t-closeness twin, verified
MinHash pair), measured same-run against DuckDB on identical oracle
SQL over the same corpora (the scale_curve_r12 method: fresh physical
plans, min of reps, DuckDB hard interrupt + memory cap — a timeout or
an oom is a data point).

Writes SCALE_CURVE_R15.json at the repo root.
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
    _time_spark,
)
from scale_curve_r14b import DUCK_MEM, _time_duck_capped  # noqa: E402

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

OPS = [
    # plans changed this round
    "assoc_rules_top20",
    "graph_ann_top10",
    "dup_span_stats",
    "simhash_wide_dup_clusters",
    # new this round
    "t_closeness_audit_served",
    "t_closeness_audit",  # the from-scratch pair for the served ratio
    "minhash_verified_dup_clusters_portable",
    "minhash_verified_dup_clusters",
]


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "duck_memory_limit": DUCK_MEM,
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
                row["duckdb"] = _time_duck_capped(d, q.oracle, reps)
            out["ops"][name][label] = row
            print(f"{name} @ {label}: {row}", file=sys.stderr, flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R15.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"ops": list(out["ops"])}))


if __name__ == "__main__":
    main()
