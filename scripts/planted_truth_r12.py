"""Planted-ground-truth correctness rungs ABOVE oracle-feasible scale
(round-12 verdict items #2 and #5).

Two queries are Spark-only above small scale factors because their
DuckDB oracles are environment-infeasible (quadratic CTE / temp-disk
exhaustion), so this script verifies them against corpora whose answer
is known BY CONSTRUCTION:

1. copurchase_triangle_count — a lineitem corpus built as a disjoint
   union of part-cliques (every order carries its clique's full part
   set, so the distinct copurchase edge set IS the clique edge set),
   plus a high-degree star hub (pair orders: edges, no triangles) and
   singleton-order noise. Exact truth:
       triangles = sum C(k,3),  edges = sum C(k,2) + |star|,
       nodes = sum k + |star| + 1.

2. golden_record_customers — a customer corpus of seeded name-typo
   clusters. Base names encode the cluster index with every digit
   QUADRUPLED, so distinct bases are >= 4 edits apart; each member is
   either the base, an exact duplicate, or a single-character
   substitution at a member-distinct position (edit distance exactly 1
   from base, >= 2 from every other cluster by the triangle
   inequality) — the lev<=1 match graph recovers exactly the planted
   clusters, and every survivorship field (min id, min name, max
   balance cents, distinct segments) is computable at generation time.

Usage:  python scripts/planted_truth_r12.py [--scale sf10|sf1|smoke]
Writes corpora under /tmp/planted12/ and the verification artifact to
PLANTED_TRUTH_r12.json (appending per-scale sections).
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/planted12"
ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANTED_TRUTH_r12.json",
)

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


# ---------------------------------------------------------------------------
# Corpus 1: planted triangles (lineitem: l_orderkey, l_partkey)


def gen_triangles(path: str, scale: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if scale == "sf10":  # ~60M lineitem-grain rows
        families = [  # (clique_size, n_cliques, orders_per_clique)
            (3, 1_000_000, 2),
            (8, 200_000, 3),
            (20, 20_000, 10),
            (40, 2_000, 100),
        ]
        star_pairs = 2_000_000
        singletons = 33_000_000
    elif scale == "sf1":
        families = [(3, 100_000, 2), (8, 20_000, 3), (20, 2_000, 10), (40, 200, 100)]
        star_pairs = 200_000
        singletons = 3_300_000
    else:  # smoke
        families = [(3, 50, 2), (8, 10, 3), (20, 4, 10), (40, 2, 5)]
        star_pairs = 30
        singletons = 500

    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "lineitem.parquet")
    schema = pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())])
    writer = pq.ParquetWriter(f, schema)

    next_part = 1
    next_order = 1
    tri = edges = nodes = 0
    t0 = time.time()
    for k, n_cliques, m_orders in families:
        tri += n_cliques * math.comb(k, 3)
        edges += n_cliques * math.comb(k, 2)
        nodes += n_cliques * k
        # parts: clique c owns [base + c*k, base + (c+1)*k)
        base_part = next_part
        next_part += n_cliques * k
        # orders: m_orders per clique, each carrying all k parts
        chunk = max(1, 2_000_000 // (k * m_orders))
        for c0 in range(0, n_cliques, chunk):
            cn = min(chunk, n_cliques - c0)
            cl = np.arange(c0, c0 + cn, dtype=np.int64)
            parts = (
                base_part + cl[:, None] * k + np.arange(k, dtype=np.int64)
            )  # (cn, k)
            parts = np.tile(parts, (1, m_orders)).reshape(-1)  # cn*m*k
            orders = (
                next_order
                + cl[:, None] * m_orders
                + np.arange(m_orders, dtype=np.int64)
            )
            orders = np.repeat(orders.reshape(-1), k)
            writer.write_table(
                pa.table({"l_orderkey": orders, "l_partkey": parts})
            )
        next_order += n_cliques * m_orders

    # star hub: pair orders (hub, fresh part) — edges, no triangles
    hub = next_part
    next_part += 1
    fresh = np.arange(next_part, next_part + star_pairs, dtype=np.int64)
    next_part += star_pairs
    edges += star_pairs
    nodes += star_pairs + 1
    okeys = np.arange(next_order, next_order + star_pairs, dtype=np.int64)
    next_order += star_pairs
    for i in range(0, star_pairs, 2_000_000):
        j = min(i + 2_000_000, star_pairs)
        writer.write_table(
            pa.table(
                {
                    "l_orderkey": np.repeat(okeys[i:j], 2),
                    "l_partkey": np.column_stack(
                        [np.full(j - i, hub, dtype=np.int64), fresh[i:j]]
                    ).reshape(-1),
                }
            )
        )

    # singleton orders: one fresh part each — no edges, no nodes (a
    # node exists only if it has an edge; degree relation is built
    # from the pair set)
    for i in range(0, singletons, 4_000_000):
        j = min(i + 4_000_000, singletons)
        writer.write_table(
            pa.table(
                {
                    "l_orderkey": np.arange(
                        next_order + i, next_order + j, dtype=np.int64
                    ),
                    "l_partkey": np.arange(
                        next_part + i, next_part + j, dtype=np.int64
                    ),
                }
            )
        )
    writer.close()
    n_rows = (
        sum(k * n * m for k, n, m in families) + 2 * star_pairs + singletons
    )
    return {
        "rows": n_rows,
        "gen_sec": round(time.time() - t0, 1),
        "truth": {"n_triangles": tri, "n_edges": edges, "n_nodes": nodes},
    }


# ---------------------------------------------------------------------------
# Corpus 2: planted golden-record clusters (customer)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _base_name(idx: int, width: int = 7) -> str:
    quad = "".join(ch * 4 for ch in str(idx).zfill(width))
    return f"Customer#{quad}"


def gen_golden(path: str, scale: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if scale == "sf10":  # 1.5M customer rows
        n_small, n_single = 100_000, 1_089_590
    elif scale == "sf1":
        n_small, n_single = 10_000, 109_590
    else:  # smoke
        n_small, n_single = 50, 300
    big_sizes = list(range(30, 10, -1))  # 20 clusters, sizes 30..11

    rng = random.Random(12)
    # construction safety: sampled distinct bases must be >= 4 edits
    # apart (digit-quadrupling argument), giving >= 2 between any two
    # members of different clusters
    probe = [_base_name(rng.randrange(10**7)) for _ in range(40)]
    for i in range(len(probe)):
        for j in range(i + 1, len(probe)):
            if probe[i] != probe[j]:
                assert _lev(probe[i], probe[j]) >= 4, (probe[i], probe[j])

    keys, names, nations, bals, segs = [], [], [], [], []
    next_key = 1
    expected_top = []
    t0 = time.time()

    def emit_cluster(cidx: int, size: int, collect_truth: bool):
        nonlocal next_key
        base = _base_name(cidx)
        nation = cidx % 25
        golden_id = next_key
        seg_set = set()
        max_bal_c = -(10**9)
        off = len(base) - 28  # first quad-digit position
        for j in range(size):
            if j == 0 or j % 7 == 3:
                nm = base  # base + exact duplicates (pre-clustering path)
            else:
                pos = off + (j % 28)
                nm = base[:pos] + chr(ord("a") + j % 26) + base[pos + 1:]
            bal_c = (next_key * 37) % 1_000_000
            keys.append(next_key)
            names.append(nm)
            nations.append(nation)
            bals.append(bal_c / 100.0)
            segs.append(SEGMENTS[j % 5])
            seg_set.add(SEGMENTS[j % 5])
            max_bal_c = max(max_bal_c, bal_c)
            next_key += 1
        if collect_truth:
            expected_top.append(
                {
                    "golden_id": golden_id,
                    "golden_name": base,
                    "n_members": size,
                    "best_acctbal_c": max_bal_c,
                    "n_segments": len(seg_set),
                }
            )

    cidx = 0
    for size in big_sizes:
        emit_cluster(cidx, size, collect_truth=True)
        cidx += 1
    for _ in range(n_small):
        emit_cluster(cidx, 4, collect_truth=False)
        cidx += 1
    for _ in range(n_single):
        emit_cluster(cidx, 1, collect_truth=False)
        cidx += 1

    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.array(names, pa.string()),
                "c_nationkey": pa.array(nations, pa.int32()),
                "c_acctbal": pa.array(bals, pa.float64()),
                "c_mktsegment": pa.array(segs, pa.string()),
            }
        ),
        os.path.join(path, "customer.parquet"),
    )
    # expected top-20: distinct sizes 30..11 dominate every filler (<=4)
    return {
        "rows": len(keys),
        "gen_sec": round(time.time() - t0, 1),
        "truth": expected_top,
    }


# ---------------------------------------------------------------------------


def main() -> None:
    scale = "sf10"
    for a in sys.argv[1:]:
        if a.startswith("--scale"):
            scale = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]

    tri_dir = os.path.join(OUT, f"tri_{scale}")
    gr_dir = os.path.join(OUT, f"gr_{scale}")
    print(f"[gen] triangles -> {tri_dir}", flush=True)
    tri_meta = gen_triangles(tri_dir, scale)
    print(f"[gen] golden -> {gr_dir}", flush=True)
    gr_meta = gen_golden(gr_dir, scale)

    from healthcare_aihw_etl_pipeline_spark import get_spark
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    spark = get_spark(app_name=f"planted12-{scale}")

    t0 = time.time()
    [tri_row] = REGISTRY["copurchase_triangle_count"].build(
        spark, tri_dir
    ).collect()
    tri_sec = time.time() - t0
    tri_got = {
        "n_triangles": tri_row.n_triangles,
        "n_edges": tri_row.n_edges,
        "n_nodes": tri_row.n_nodes,
    }
    tri_ok = tri_got == tri_meta["truth"]
    print(f"[tri] ok={tri_ok} {tri_got} vs {tri_meta['truth']} "
          f"({tri_sec:.1f}s)", flush=True)

    t0 = time.time()
    gr_rows = REGISTRY["golden_record_customers"].build(spark, gr_dir).collect()
    gr_sec = time.time() - t0
    gr_got = [
        {
            "golden_id": r.golden_id,
            "golden_name": r.golden_name,
            "n_members": r.n_members,
            "best_acctbal_c": r.best_acctbal_c,
            "n_segments": r.n_segments,
        }
        for r in gr_rows
    ]
    gr_ok = gr_got == gr_meta["truth"]
    print(f"[golden] ok={gr_ok} ({gr_sec:.1f}s)", flush=True)
    if not gr_ok:
        for g, w in zip(gr_got, gr_meta["truth"]):
            if g != w:
                print(f"  got {g}\n  want {w}")

    art = {}
    if os.path.exists(ARTIFACT):
        art = json.load(open(ARTIFACT))
    art[scale] = {
        "triangles": {
            "corpus_rows": tri_meta["rows"],
            "truth": tri_meta["truth"],
            "spark": tri_got,
            "match": tri_ok,
            "spark_sec": round(tri_sec, 1),
        },
        "golden_record": {
            "corpus_rows": gr_meta["rows"],
            "expected_top20": gr_meta["truth"],
            "spark_top20": gr_got,
            "match": gr_ok,
            "spark_sec": round(gr_sec, 1),
        },
    }
    json.dump(art, open(ARTIFACT, "w"), indent=1)
    print(f"[artifact] {ARTIFACT} section '{scale}' written", flush=True)
    if not (tri_ok and gr_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
