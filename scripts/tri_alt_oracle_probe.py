"""Probe: can DuckDB verify copurchase_triangle_count at sf1/sf10 with
a better-shaped formulation than the r11 attempts?

r11 evidence: the lineitem-self-join + EXISTS wedge form timed out at
sf1 (>420 s) and exhausted temp disk at sf10; a list_intersect
edge-iterator also exceeded 420 s at sf1 (DuckDB's list_intersect is
quadratic per pair, unlike Spark's hash-set array_intersect).

This probe re-shapes both stages the way the round-15 Spark rewrite
did: pairs from a row-local basket-array fan-out (no corpus
self-join), and the closing as a streaming JOIN-counted wedge probe
(hash join, no EXISTS, nothing materialized past the aggregate).

Usage: python scripts/tri_alt_oracle_probe.py /tmp/sfbench/sf1
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbench/sf1"

import sys as _sys

_sys.path.insert(0, "/root/repo")
from healthcare_aihw_etl_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
import healthcare_aihw_etl_pipeline_spark.plans  # noqa: E402,F401  (populate)

SQL = REGISTRY["copurchase_triangle_count"].alt_oracle


def main():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    t0 = time.time()
    rows = con.execute(SQL).fetchall()
    print(
        json.dumps(
            {
                "sf_dir": SF,
                "wall_s": round(time.time() - t0, 1),
                "result": rows[0],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
