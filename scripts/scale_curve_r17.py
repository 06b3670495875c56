#!/usr/bin/env python
"""Round-17 scale curve: the SAME op ledger as SCALE_CURVE_R16 (so the
two rounds pair directly), re-run on a quiet host after the r17
optimizations. VERDICT r16 items 1 and 6 grade against this artifact:
assoc_rules/minhash sf10 back at (or under) r15 numbers, interval
sweep family at the two-level numbers, survival raw forms at the
family floor.

A session-warm pass of one cheap query runs FIRST so the session-first
cold cost (codegen+JIT, ~8 s — see plans/r17/survival_probe.json) is
not charged to whichever ledger op happens to run first, which is
exactly the artifact that produced the r16 curve's two phantom
regressions.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_curve_r12 import (  # noqa: E402
    DUCK_TIMEOUT,
    _ensure_corpora,
    _time_spark,
)
from scale_curve_r14b import DUCK_MEM, _time_duck_capped  # noqa: E402
from scale_curve_r16 import DIRS, OPS  # noqa: E402

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    only = None
    if "--ops" in sys.argv:
        only = sys.argv[sys.argv.index("--ops") + 1].split(",")
    _ensure_corpora()
    spark = get_spark()
    # Session warm-up: charge codegen/JIT/first-scan to a throwaway
    # job, not to the first ledger op.
    t0 = time.perf_counter()
    REGISTRY["count_distinct_years"].build(
        spark, "/tmp/sfbench/sf1"
    ).collect()
    warm = round(time.perf_counter() - t0, 3)
    out: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "duck_timeout_s": DUCK_TIMEOUT,
        "duck_memory_limit": DUCK_MEM,
        "session_warmup_sec": warm,
        "ops": {},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R17.json",
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
            spark.sparkContext.setJobDescription(f"curve {name}@{label}")
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
