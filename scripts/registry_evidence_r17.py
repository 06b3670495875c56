#!/usr/bin/env python
"""Round-17 registry-wide evidence (r16 verdict item 7).

One pass over EVERY registered query:
  - .explain("formatted") plan-shape stats (Exchange / join strategy /
    Python-boundary node counts) -> plans/r17/_plan_stats.json
  - cold build+collect seconds in registry order (fresh untuned
    session, the sweep-guard methodology) -> plans/r17/_cold_sweep.json

Both artifacts are COMMITTED so "every operator examined" is
verifiable in-repo (the r16 versions lived in /tmp and were lost).

Usage:
  python scripts/registry_evidence_r17.py [--sf /root/testdata/sf0.001]
      [--no-time] [--out-tag _plan_stats]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

from opt_r17_measure import plan_stats  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()
    os.makedirs(PLANS_DIR, exist_ok=True)

    spark = get_spark(app_name="registry_evidence_r17")
    sc = spark.sparkContext

    stats: dict[str, dict] = {}
    sweep: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in REGISTRY.items():
        sc.setJobDescription(f"evidence: {name}")
        t0 = time.perf_counter()
        df = (q.build or q.fn)(spark, args.sf)
        if not args.no_time:
            df.collect()
            sweep[name] = round(time.perf_counter() - t0, 3)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        stats[name] = plan_stats(txt)
        print(f"{name}: {sweep.get(name, '-')}s {stats[name]}", flush=True,
              file=sys.stderr)
    meta = {
        "sf": args.sf,
        "n_queries": len(REGISTRY),
        "wall_sec": round(time.perf_counter() - t_all, 1),
    }
    with open(os.path.join(PLANS_DIR, "_plan_stats.json"), "w") as fh:
        json.dump({"_meta": meta, "ops": stats}, fh, indent=1, sort_keys=True)
    if not args.no_time:
        with open(os.path.join(PLANS_DIR, "_cold_sweep.json"), "w") as fh:
            json.dump({"_meta": meta, "ops": sweep}, fh, indent=1,
                      sort_keys=True)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
