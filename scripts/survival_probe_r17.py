#!/usr/bin/env python
"""Round-17 survival-family sf1/sf10 probe (VERDICT r16 item 6).

kaplan_meier_conversion measured 10.2 s at sf10 in SCALE_CURVE_R16
while nelson_aalen_hazard — which consumes the SAME shared duration
relation with a near-identical day-grain window tail — measured 3.8 s
in the same run. Before touching the operator, pair the whole family
back-to-back in one fresh session (guide §1: measure first) so
ordering/page-cache effects of the r16 curve cannot masquerade as a
plan problem. Runs each op twice in opposite orders to expose
order-dependence.

Usage: python scripts/survival_probe_r17.py <out_json> [sfdir...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

OUT = sys.argv[1]
DIRS = sys.argv[2:] or ["/tmp/sfbench/sf1", "/tmp/sfbench/sf10"]
OPS = [
    "kaplan_meier_conversion",
    "nelson_aalen_hazard",
    "cox_hazard_newton",
    "logrank_arm_test",
    "kaplan_meier_conversion_served",
    "nelson_aalen_hazard_served",
]


def _once(spark, name: str, d: str) -> float:
    q = REGISTRY[name]
    spark.sparkContext.setJobDescription(f"survival_probe {name}@{d}")
    t0 = time.perf_counter()
    q.build(spark, d).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark()
    out: dict = {"dirs": DIRS, "ops": {}}
    for d in DIRS:
        label = os.path.basename(d)
        # pass 1: registry order (cold page cache for the first op,
        # like the r16 curve); pass 2: reversed (KM runs last).
        for tag, seq in (("fwd", OPS), ("rev", list(reversed(OPS)))):
            for name in seq:
                sec = _once(spark, name, d)
                out["ops"].setdefault(name, {}).setdefault(label, {})[
                    tag
                ] = sec
                print(f"{label} {tag} {name}: {sec}s", flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
