#!/usr/bin/env python
"""Scale curves for the round-12 query family, to sf10, both engines —
plus the sweep-line fusion A/B the round-11 review requested.

Covers the new round-12 queries (fused sweep profile, Cox PH Newton
step, logistic Newton step, BPE merge training, winnowing xxhash64
fast path) and re-measures the two refactored sweep queries so the
fusion A/B is same-run: `ab_sweep_fusion` records, per scale factor,
the cost of serving BOTH sweep families as two passes
(max_concurrent_sessions + interval_union_coverage) vs ONE fused pass
(interval_sweep_profile), on both engines. Method matches
scale_curve_r11b: fresh physical plans, min of reps, DuckDB hard
interrupt at DUCK_TIMEOUT (a timeout is a data point).

Writes SCALE_CURVE_R12.json at the repo root and prints it to stdout.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

DUCK_TIMEOUT = int(os.environ.get("DUCK_TIMEOUT", "60"))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

DIRS = [
    ("sf0.01", "/root/testdata/sf0.01", 3),
    ("sf0.1", "/root/testdata/sf0.1", 3),
    ("sf1", "/tmp/sfbench/sf1", 2),
    ("sf10", "/tmp/sfbench/sf10", 1),
]

OPS = [
    "interval_sweep_profile",
    "max_concurrent_sessions",
    "interval_union_coverage",
    "cox_hazard_newton",
    "logistic_newton_step",
    "bpe_merge_training",
    "winnow_shared_fingerprints",
    "winnow_shared_fingerprints_fast",
    "roc_auc_order_age",
    "isotonic_calibration_by_age",
    "conformal_interval_price",
    "t_closeness_audit",
    "pca_power_component",
]

_SF_ORDER = [d[0] for d in DIRS]


def _ensure_corpora() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isfile("/tmp/sfbench/sf1/lineitem.parquet"):
        subprocess.run([sys.executable, os.path.join(here, "make_sf1.py")],
                       check=True)
    if not os.path.isfile("/tmp/sfbench/sf10/lineitem.parquet"):
        env = {**os.environ, "SFB_SRC": "/tmp/sfbench/sf1",
               "SFB_DST": "/tmp/sfbench/sf10"}
        subprocess.run([sys.executable, os.path.join(here, "make_sf1.py")],
                       check=True, env=env)


def _time_spark(build, reps: int) -> float:
    from pyspark.sql import functions as F

    build().collect()  # warm (codegen, page cache, derived caches)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        build().where(F.lit(True)).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _time_duck(d: str, sql: str, reps: int):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        p = f"{d}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    best = float("inf")
    try:
        for _ in range(reps):
            timer = threading.Timer(DUCK_TIMEOUT, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            finally:
                timer.cancel()
            best = min(best, time.perf_counter() - t0)
    except Exception:
        # keep a successful earlier rep: a later interrupt (cache
        # eviction, background load) must not erase a real data point
        if best != float("inf"):
            return round(best, 3)
        return f"timeout{DUCK_TIMEOUT}s"
    finally:
        con.close()
    return round(best, 3)


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                 "duck_timeout_s": DUCK_TIMEOUT, "ops": {},
                 "ab_sweep_fusion": {}}
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
    # Fusion A/B: serving BOTH sweep families — two passes vs one.
    for label, d, _reps in DIRS:
        if label not in out["ops"]["interval_sweep_profile"]:
            continue
        two = out["ops"]["max_concurrent_sessions"][label]
        one = out["ops"]["interval_sweep_profile"][label]
        cov = out["ops"]["interval_union_coverage"][label]
        entry = {
            "spark_two_passes": round(two["spark"] + cov["spark"], 3),
            "spark_fused": one["spark"],
        }
        if all(isinstance(x.get("duckdb"), (int, float))
               for x in (two, cov, one)):
            entry["duckdb_two_passes"] = round(
                two["duckdb"] + cov["duckdb"], 3
            )
            entry["duckdb_fused"] = one["duckdb"]
        out["ab_sweep_fusion"][label] = entry
        print(f"ab_sweep_fusion @ {label}: {entry}", file=sys.stderr)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R12.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
