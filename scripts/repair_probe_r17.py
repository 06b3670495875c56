#!/usr/bin/env python
"""Round-17 focused re-pair probe (VERDICT r16 "Next round" item 1).

Times a small list of suspect queries at sf1 and sf10 in ONE fresh
session, so HEAD and the r15 parent commit can be paired back-to-back
on the same quiet host. Usage:

  python scripts/repair_probe_r17.py <repo_root> <out_json> [names...]

Defaults to the two suspected regressions plus dup_span_stats as the
in-run control (it moved the OTHER way in SCALE_CURVE_R16, so uniform
host noise would show on it too).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1])
OUT = sys.argv[2]
NAMES = sys.argv[3:] or [
    "assoc_rules_top20",
    "minhash_verified_dup_clusters",
    "dup_span_stats",
]
sys.path.insert(0, REPO)

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

DIRS = [("sf1", "/tmp/sfbench/sf1", 2), ("sf10", "/tmp/sfbench/sf10", 1)]


def _time_spark(build, reps: int) -> float:
    from pyspark.sql import functions as F

    build().collect()  # warm (codegen, page cache, derived caches)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        build().where(F.lit(True)).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark()
    out = {"repo": REPO, "ops": {}}
    reg = dict(REGISTRY)
    for name in NAMES:
        q = reg[name]
        out["ops"][name] = {}
        for label, d, reps in DIRS:
            spark.sparkContext.setJobDescription(f"repair {name}@{label}")
            t0 = time.perf_counter()
            sec = _time_spark(lambda: q.build(spark, d), reps)
            warm_total = round(time.perf_counter() - t0, 3)
            out["ops"][name][label] = {"spark": sec, "incl_warm": warm_total}
            print(f"{name} @ {label}: {out['ops'][name][label]}",
                  file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
