#!/usr/bin/env python
"""DML scale smoke: does row-level DELETE cost scale with the MATCHED
file count, not the table size?

Builds a txlog table from sf0.1 lineitem (600k rows) partitioned by
l_returnflag, with the data spread over many files, then times:
  narrow : DELETE matching rows confined to ONE partition's files
  broad  : DELETE matching rows in EVERY file
and reports the matched-file counts and rewrite walls. The copy-on-write
claim holds when narrow's rewritten-file count (and its wall, net of the
fixed match-discovery scan both variants pay) tracks the matched subset.

Usage: python scripts/dml_scale_smoke.py [scratch_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark import get_spark
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
from healthcare_aihw_etl_pipeline_spark.sources.txlog import TxLogTable

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, root: str) -> TxLogTable:
    t = TxLogTable(root, ["l_returnflag"])
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    # 16 files per partition: the multi-file layout a real table has
    t.append(li.repartition(16))
    return t


def main() -> None:
    scratch = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dml-smoke-"
    )
    spark = get_spark(app_name="dml_smoke")
    out = {}
    try:
        # Warm the whole delete path (codegen, staging, commit machinery)
        # on a throwaway table so the first timed variant is not paying
        # JVM warmup the second one skips.
        warm_root = os.path.join(scratch, "warm")
        warm = build(spark, warm_root)
        warm.delete_where(spark, "l_quantity >= 49.0")
        for tag, pred, prune in [
            # rows only in the 'R' partition -> only its files match
            ("narrow", "l_returnflag = 'R' AND l_quantity >= 49.0", None),
            # same predicate with the implied stats bound: the discovery
            # scan reads only the candidate third of the files
            ("narrow_pruned", "l_returnflag = 'R' AND l_quantity >= 49.0",
             ("l_returnflag", "R", "R")),
            # high-quantity rows exist in every file of every partition
            ("broad", "l_quantity >= 25.0", None),
        ]:
            root = os.path.join(scratch, tag)
            t = build(spark, root)
            manifest = t.head()[1]
            n_files = len(manifest["files"])
            n_cand = (
                len(t._stats_prune(manifest, *prune)) if prune else n_files
            )
            t0 = time.perf_counter()
            t.delete_where(spark, pred, prune=prune)
            wall = time.perf_counter() - t0
            rewritten = len(t.head()[1].get("removed", []))
            out[tag] = {
                "table_files": n_files,
                "files_scanned_for_match": n_cand,
                "files_rewritten": rewritten,
                "delete_wall_sec": round(wall, 3),
            }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
