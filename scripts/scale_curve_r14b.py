#!/usr/bin/env python
"""Round-14 continuation scale curves: the five new query families
(dup-span stats, BH-FDR, regression discontinuity, association rules,
Markov attribution) plus the verified wide SimHash, measured same-run
against DuckDB on identical oracle SQL over the same corpora
(the scale_curve_r12 method: fresh physical plans, min of reps,
DuckDB hard interrupt — a timeout is a data point).

DuckDB additionally runs under a hard memory_limit here: the first
sf10 window-replay attempt showed the document-heavy oracles
(simhash_wide, dup_span) can grow the oracle process past physical
memory at the 5M-doc replicated layout — an out-of-memory verdict is
recorded as a data point ('oom'), exactly like a timeout, instead of
thrashing the host.

Writes SCALE_CURVE_R14B.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402
from scale_curve_r12 import (  # noqa: E402
    DIRS,
    DUCK_TIMEOUT,
    TABLES,
    _ensure_corpora,
    _time_spark,
)

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

OPS = [
    "dup_span_stats",
    "bh_fdr_nation_tests",
    "rdd_order_value",
    "assoc_rules_top20",
    "markov_attribution",
    "simhash_wide_dup_clusters",
]

DUCK_MEM = os.environ.get("SCURVE_DUCK_MEM", "48GB")


def _time_duck_capped(d: str, sql: str, reps: int):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(f"SET memory_limit='{DUCK_MEM}'")
    for t in TABLES:
        p = f"{d}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    best = float("inf")
    verdict = None
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
    except duckdb.OutOfMemoryException:
        verdict = f"oom{DUCK_MEM}"
    except duckdb.InterruptException:
        verdict = f"timeout{DUCK_TIMEOUT}s"
    except Exception as e:  # binder/SQL error — NOT a timeout: name it
        verdict = f"error:{type(e).__name__}"
    finally:
        con.close()
    # A failure after a successful rep is still reported (best time
    # wins only when no verdict was recorded).
    if verdict is not None and best != float("inf"):
        return f"{round(best, 3)};{verdict}"
    if best != float("inf"):
        return round(best, 3)
    return verdict


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
        "SCALE_CURVE_R14B.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
