#!/usr/bin/env python
"""Scale curves for the round-11b query family, to sf10, both engines.

Covers the eight round-11b queries (RRF hybrid fusion, grid-density
clustering, winnowing fingerprints, Theil-Sen trend, decision-stump
information gain, event trigram mining, FIFO allocation matching,
Nelson-Aalen hazard). Method matches scale_curve_heavy: registry
queries rebuilt through fresh physical plans (min of reps), DuckDB
runs the SAME oracle SQL over views of the same parquet with a hard
interrupt at DUCK_TIMEOUT (a timeout is a data point — e.g. the
recursive-CTE closure in golden_record's oracle goes quadratic on
replicated clusters, exactly like embedding_cluster_keep_best's).

Writes SCALE_CURVE_R11B.json at the repo root and prints it to stdout.
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
    "hybrid_rrf_fusion_top10",
    "grid_density_clusters",
    "winnow_shared_fingerprints",
    "theil_sen_daily_trend",
    "decision_stump_quantity_split",
    "event_trigram_patterns",
    "fifo_return_matching",
    "nelson_aalen_hazard",
]

# Per-op scale ceiling (currently none; see scale_curve_r11.py for the
# policy rationale).
MAX_SF: dict[str, str] = {}
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
        return f"timeout{DUCK_TIMEOUT}s"
    finally:
        con.close()
    return round(best, 3)


def main() -> None:
    _ensure_corpora()
    spark = get_spark()
    out: dict = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                 "duck_timeout_s": DUCK_TIMEOUT, "ops": {}}
    for name in OPS:
        q = REGISTRY[name]
        out["ops"][name] = {}
        for label, d, reps in DIRS:
            if not os.path.isfile(f"{d}/lineitem.parquet"):
                continue
            cap = MAX_SF.get(name)
            if cap and _SF_ORDER.index(label) > _SF_ORDER.index(cap):
                continue
            row: dict = {}
            row["spark"] = _time_spark(lambda: q.build(spark, d), reps)
            if q.oracle:
                row["duckdb"] = _time_duck(d, q.oracle, reps)
            out["ops"][name][label] = row
            print(f"{name} @ {label}: {row}", file=sys.stderr)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE_R11B.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
