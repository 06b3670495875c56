#!/usr/bin/env python
"""Generate an sf1 bench corpus at /tmp/sfbench/sf1 by 10x replication
of the read-only driver corpus at /root/testdata/sf0.1.

Each copy offsets every key column by copy_index * (max_key + 1), so key
cardinalities, join fan-outs, and group sizes all scale linearly exactly
as a larger generator run would produce (10x customers each with the
same order count, 10x orders each with the same lineitem count). Value
columns are left untouched — aggregates scale additively and the DuckDB
oracle stays comparable. Files are written with bounded row groups
(128k rows) so the sf1 scan parallelizes like real multi-row-group data
instead of inheriting the single-row-group bench artifact of sf0.1.

A sibling symlink /tmp/sfbench/sf0.1 -> /root/testdata/sf0.1 lets
bench.py's decade-smaller floor/marginal split work unchanged:
  SPARK_GRAFT_SF_DIR=/tmp/sfbench/sf1 python bench.py --duckdb
"""
from __future__ import annotations

import os

import duckdb

# Env overrides generalize the replicator to further decades, e.g.
#   SFB_SRC=/tmp/sfbench/sf1 SFB_DST=/tmp/sfbench/sf10 python make_sf1.py
# (strides derive from MAX(key)+1 of whatever SRC is, so chained
# replication keeps key spaces disjoint).
SRC = os.environ.get("SFB_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SFB_DST", "/tmp/sfbench/sf1")
COPIES = int(os.environ.get("SFB_COPIES", "10"))
# Per-table row-group sizing: ~32 groups per table (one per core),
# bounded to [2048, 131072] rows. A single fixed size leaves small
# tables (embeddings: 20k rows of array<float>) in ONE row group — a
# one-task scan whose nested-column decode then serializes, which is a
# layout artifact no real large table has.
RG_LO, RG_HI, RG_TARGET_GROUPS = 2048, 131072, 32

# table -> columns needing a per-copy offset (key-space columns)
OFFSETS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# nation/region are fixed-size dimensions at every SF: copy once.
SINGLETON = {"region", "nation"}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    # decade-smaller sibling for bench.py's floor/marginal split:
    # symlink the SOURCE next to DST under its sf name (sf1 builds get
    # sf0.1 -> /root/testdata/sf0.1; chained sf10 builds already have
    # the real sf1 directory sitting beside them).
    src_name = os.path.basename(SRC.rstrip("/"))
    sib = os.path.join(os.path.dirname(DST), src_name)
    if not os.path.exists(sib):
        os.symlink(SRC, sib)
    con = duckdb.connect()
    for table, keys in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        if not os.path.exists(src):
            continue
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            print(f"{table}: exists, skipping")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        missing = [k for k in keys if k not in cols]
        keys = [k for k in keys if k in cols]
        if missing:
            print(f"{table}: no such key cols {missing}; offsetting {keys}")
        n_src = con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        rg = max(RG_LO, min(RG_HI, (n_src * COPIES) // RG_TARGET_GROUPS))
        if table in SINGLETON:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{out}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
            )
            print(f"{table}: copied (singleton dim)")
            continue
        strides = {
            k: con.execute(f"SELECT MAX({k}) + 1 FROM '{src}'").fetchone()[0]
            for k in keys
        }
        select = ", ".join(
            f"({c} + i.c * {strides[c]}) AS {c}" if c in strides else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM '{src}', "
            f"(SELECT UNNEST(range({COPIES})) AS c) i ORDER BY i.c) "
            f"TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
