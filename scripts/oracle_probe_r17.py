#!/usr/bin/env python
"""Round-17 oracle equivalence probe: run named queries against their
DuckDB oracles at one or more SF dirs (the restructure-proof step the
round rules require before moving on).

  python scripts/oracle_probe_r17.py name1,name2 [sf_dir ...]
"""
from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_check import compare  # noqa: E402

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.sources.catalog import (  # noqa: E402
    TABLES,
)

names = sys.argv[1].split(",")
dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1"]
spark = get_spark(app_name="oracle_probe_r17")
fails = 0
for d in dirs:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{d}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    for n in names:
        q = REGISTRY[n]
        if not q.oracle:
            print(f"{n} @ {d}: NO ORACLE", flush=True)
            continue
        try:
            compare((q.build or q.fn)(spark, d), con, q.oracle, n)
            print(f"{n} @ {d}: OK", flush=True)
        except AssertionError as e:
            fails += 1
            print(f"{n} @ {d}: FAIL {str(e)[:500]}", flush=True)
    con.close()
sys.exit(1 if fails else 0)
