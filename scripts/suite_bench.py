#!/usr/bin/env python
"""Whole-surface wall-time: run EVERY registered query once at a given
SF dir (default sf0.1), plus the DuckDB oracle total for the oracled
subset — the completeness-at-speed number the 12-query headline bench
doesn't show. Single warmed session, one collect per query, queries in
registry order.

Usage: python scripts/suite_bench.py [sf_dir]
Prints one JSON line {"suite_sec", "n_queries", "duckdb_sec",
"n_oracled", "slowest": {...top 8...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY
from healthcare_aihw_etl_pipeline_spark.session import get_spark
from healthcare_aihw_etl_pipeline_spark.sources.catalog import TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="suite-bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/session warmup (memory: codegen reaches steady state on rerun).
    REGISTRY["revenue_by_nation"].fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name, q in REGISTRY.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    n_oracled = 0
    for name, q in REGISTRY.items():
        if q.oracle:
            con.execute(q.oracle).fetchall()
            n_oracled += 1
    duck_sec = time.perf_counter() - t0

    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:8])
    print(
        json.dumps(
            {
                "suite_sec": round(sum(times.values()), 3),
                "n_queries": len(times),
                "duckdb_sec": round(duck_sec, 3),
                "n_oracled": n_oracled,
                "sf_dir": sf_dir,
                "slowest": slowest,
            }
        )
    )


if __name__ == "__main__":
    main()
