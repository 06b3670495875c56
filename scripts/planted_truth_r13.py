"""Planted-ground-truth correctness rungs ABOVE oracle-feasible scale
(round-12 verdict item #6: the closure family + the exact-Jaccard
pair join, whose DuckDB oracles are quadratic — recursive-CTE
reachability / all-pairs gram self-join — and excluded from sf10
replays for that reason).

1. dedup_transitive_clusters — a documents corpus of planted duplicate
   clusters. Each cluster owns a DISTINCT 10-token prefix (the e2 edge
   key), so the component partition is the prefix partition BY
   CONSTRUCTION; within a cluster, members pair into exact-duplicate
   subgroups (identical text -> e1 edges whose group min is NOT the
   prefix min for later pairs), so min-label propagation must walk
   2-hop chains, not just stars. Singleton-prefix noise docs have no
   edges and must be ABSENT from the output. Exact truth: the
   cluster-size histogram plus the component/max_doc checksums, all
   computable at generation time because doc ids are dealt round-robin
   and each cluster's member ids are a known arithmetic set.

2. jaccard_pair_similarity — a documents corpus where the global
   top-20 similar pairs are planted with EXACT 5-gram arithmetic: pair
   docs share a k-token prefix and carry m distinct tail tokens each
   (all tokens globally unique otherwise), giving n_inter = k-4,
   n_union = k + 2m - 4 exactly; 25 qualifying pairs with strictly
   descending jaccard (the top-20 and their order are known), plus
   sub-threshold decoys (must be filtered by 2*inter >= union) and
   unique-token noise docs (no shared grams at all).

Usage:  python scripts/planted_truth_r13.py [--scale sf10|sf1|smoke]
Writes corpora under /tmp/planted13/ and appends per-scale sections to
PLANTED_TRUTH_r13.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/planted13"
ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANTED_TRUTH_r13.json",
)


# ---------------------------------------------------------------------------
# Corpus 1: planted duplicate clusters (documents: doc_id, text)


def gen_clusters(path: str, scale: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if scale == "sf10":  # ~20M docs
        families = [(2, 4_000_000), (5, 800_000), (50, 20_000), (1000, 500)]
        singletons = 6_500_000
    elif scale == "sf1":
        families = [(2, 400_000), (5, 80_000), (50, 2_000), (1000, 50)]
        singletons = 650_000
    else:
        families = [(2, 40), (5, 8), (50, 2), (1000, 1)]
        singletons = 65

    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "documents.parquet")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    writer = pq.ParquetWriter(f, schema)

    t0 = time.time()
    next_id = 0
    hist: dict[int, int] = {}
    comp_sum = 0  # sum over clusters of component id (= min member id)
    maxdoc_sum = 0  # sum over clusters of max member id
    ndocs_sum = 0
    cluster_idx = 0
    for size, n_clusters in families:
        hist[size] = hist.get(size, 0) + n_clusters
        chunk = max(1, 2_000_000 // size)
        for c0 in range(0, n_clusters, chunk):
            cn = min(chunk, n_clusters - c0)
            cids = np.arange(cluster_idx + c0, cluster_idx + c0 + cn)
            # member ids: cluster c gets ids base + c*size .. base+(c+1)*size-1
            ids = (
                next_id
                + (cids[:, None] - (cluster_idx + c0)) * size
                + np.arange(size)[None, :]
            )
            # 10-token prefix distinct per cluster; exact-dup subgroups
            # pair members (i//2): identical text within a pair, same
            # prefix across the cluster.
            prefix = np.char.add("c", cids.astype("U12"))
            prefix = np.char.add(
                prefix, " p1 p2 p3 p4 p5 p6 p7 p8 p9 tail"
            )  # 10 shared tokens total (c<id> + 9 fixed + tail varies below)
            sub = np.arange(size)[None, :] // 2
            text = np.char.add(
                np.char.add(prefix[:, None], " s"),
                sub.astype("U8"),
            )
            writer.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(ids.ravel(), pa.int64()),
                        "text": pa.array(text.ravel().tolist(), pa.string()),
                    }
                )
            )
            comp_sum += int(ids[:, 0].sum())
            maxdoc_sum += int(ids[:, -1].sum())
            ndocs_sum += int(ids.size)
            next_id = int(ids[-1, -1]) + 1
        cluster_idx += n_clusters
    # noise: unique prefix AND unique text -> no edges, absent from output
    chunk = 2_000_000
    for s0 in range(0, singletons, chunk):
        sn = min(chunk, singletons - s0)
        ids = np.arange(next_id, next_id + sn)
        text = np.char.add(
            np.char.add("z", ids.astype("U12")),
            " q1 q2 q3 q4 q5 q6 q7 q8 q9 lone",
        )
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(text.tolist(), pa.string()),
                }
            )
        )
        next_id += sn
    writer.close()
    return {
        "n_docs_total": next_id,
        "gen_sec": round(time.time() - t0, 1),
        "truth": {
            "size_histogram": {str(k): v for k, v in sorted(hist.items())},
            "n_components": sum(hist.values()),
            "n_docs_in_components": ndocs_sum,
            "component_sum": comp_sum,
            "max_doc_sum": maxdoc_sum,
        },
    }


def verify_clusters(spark, path: str, truth: dict) -> dict:
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    t0 = time.time()
    df = REGISTRY["dedup_transitive_clusters"].build(spark, path)
    got = (
        df.agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("n_docs").cast("long").alias("n_docs_in_components"),
            F.sum("component").cast("long").alias("component_sum"),
            F.sum("max_doc").cast("long").alias("max_doc_sum"),
        ).collect()
    )[0]
    hist = {
        str(r["n_docs"]): r["n"]
        for r in df.groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ok = (
        got["n_components"] == truth["n_components"]
        and got["n_docs_in_components"] == truth["n_docs_in_components"]
        and got["component_sum"] == truth["component_sum"]
        and got["max_doc_sum"] == truth["max_doc_sum"]
        and hist == truth["size_histogram"]
    )
    return {
        "ok": bool(ok),
        "got": {
            "n_components": got["n_components"],
            "n_docs_in_components": got["n_docs_in_components"],
            "component_sum": got["component_sum"],
            "max_doc_sum": got["max_doc_sum"],
            "size_histogram": hist,
        },
        "query_sec": round(time.time() - t0, 1),
    }


# ---------------------------------------------------------------------------
# Corpus 2: planted exact-Jaccard top pairs (documents: doc_id, text)


def _pair_params() -> list[tuple[int, int]]:
    """25 qualifying (k, m) with strictly DESCENDING jaccard
    (k-4)/(k+2m-4), all >= 0.5: fixed m = 20, k = 300 - 8r, so
    j = (k-4)/(k+36) is monotone in k and >= 0.5 while k >= 44."""
    out = []
    for r in range(25):
        k = 300 - 8 * r  # prefix tokens
        m = 20  # tail tokens per side
        j = (k - 4) / (k + 2 * m - 4)
        assert 2 * (k - 4) >= k + 2 * m - 4, (k, m, j)
        out.append((k, m))
    js = [(k - 4) / (k + 2 * m - 4) for k, m in out]
    assert all(js[i] > js[i + 1] + 1e-9 for i in range(len(js) - 1))
    return out


def gen_jaccard(path: str, scale: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    noise = {"sf10": 10_000_000, "sf1": 1_000_000}.get(scale, 1_000)
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "documents.parquet")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    writer = pq.ParquetWriter(f, schema)

    t0 = time.time()
    rows_id: list[int] = []
    rows_tx: list[str] = []
    truth_pairs = []
    # qualifying pairs get the LOW ids (stable tiebreak evidence);
    # noise/decoy ids sit far above.
    did = 0
    for pi, (k, m) in enumerate(_pair_params()):
        shared = " ".join(f"p{pi}s{t}" for t in range(k))
        a = shared + " " + " ".join(f"p{pi}a{t}" for t in range(m))
        b = shared + " " + " ".join(f"p{pi}b{t}" for t in range(m))
        n_inter = k - 4
        n_union = k + 2 * m - 4
        truth_pairs.append(
            {
                "id_a": did,
                "id_b": did + 1,
                "n_inter": n_inter,
                "n_union": n_union,
                "jaccard": round(n_inter / n_union, 6),
            }
        )
        rows_id += [did, did + 1]
        rows_tx += [a, b]
        did += 2
    # sub-threshold decoys: k' tokens shared with 2*(k'-4) < union
    for qi in range(30):
        k, m = 24, 30  # j = 20/80 = 0.25 < 0.5
        shared = " ".join(f"d{qi}s{t}" for t in range(k))
        a = shared + " " + " ".join(f"d{qi}a{t}" for t in range(m))
        b = shared + " " + " ".join(f"d{qi}b{t}" for t in range(m))
        rows_id += [did, did + 1]
        rows_tx += [a, b]
        did += 2
    writer.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows_id, pa.int64()),
                "text": pa.array(rows_tx, pa.string()),
            }
        )
    )
    # noise: 6 globally-unique tokens per doc -> grams unique, no pairs
    base = 1_000_000
    chunk = 1_000_000
    for s0 in range(0, noise, chunk):
        sn = min(chunk, noise - s0)
        ids = np.arange(base + s0, base + s0 + sn)
        u = ids.astype("U12")
        text = np.char.add("n", u)
        for suffix in (" na", " nb", " nc", " nd", " ne"):
            text = np.char.add(text, np.char.add(suffix, u))
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(text.tolist(), pa.string()),
                }
            )
        )
    writer.close()
    truth_pairs.sort(key=lambda p: (-p["jaccard"], p["id_a"]))
    return {
        "n_docs_total": did + noise,
        "gen_sec": round(time.time() - t0, 1),
        "truth": {"top20": truth_pairs[:20]},
    }


def verify_jaccard(spark, path: str, truth: dict) -> dict:
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    t0 = time.time()
    rows = REGISTRY["jaccard_pair_similarity"].build(spark, path).collect()
    got = [
        {
            "id_a": r["id_a"],
            "id_b": r["id_b"],
            "n_inter": r["n_inter"],
            "n_union": r["n_union"],
            "jaccard": r["jaccard"],
        }
        for r in rows
    ]
    ok = got == truth["top20"]
    return {"ok": bool(ok), "got": got, "query_sec": round(time.time() - t0, 1)}


def main() -> None:
    scale = "smoke"
    if "--scale" in sys.argv:
        scale = sys.argv[sys.argv.index("--scale") + 1]

    from healthcare_aihw_etl_pipeline_spark import get_spark

    spark = get_spark(app_name=f"planted13-{scale}")
    section: dict = {"scale": scale}

    cdir = os.path.join(OUT, f"clusters_{scale}")
    meta = gen_clusters(cdir, scale)
    res = verify_clusters(spark, cdir, meta["truth"])
    section["dedup_transitive_clusters"] = {**meta, **res}
    print(f"clusters {scale}: ok={res['ok']} "
          f"gen={meta['gen_sec']}s query={res['query_sec']}s",
          file=sys.stderr)

    jdir = os.path.join(OUT, f"jaccard_{scale}")
    meta = gen_jaccard(jdir, scale)
    res = verify_jaccard(spark, jdir, meta["truth"])
    section["jaccard_pair_similarity"] = {
        "n_docs_total": meta["n_docs_total"],
        "gen_sec": meta["gen_sec"],
        "ok": res["ok"],
        "query_sec": res["query_sec"],
        "truth_top20": meta["truth"]["top20"],
        "got": res["got"],
    }
    print(f"jaccard {scale}: ok={res['ok']} "
          f"gen={meta['gen_sec']}s query={res['query_sec']}s",
          file=sys.stderr)

    kdir = os.path.join(OUT, f"keepbest_{scale}")
    meta = gen_keepbest(kdir, scale)
    res = verify_keepbest(spark, kdir, meta["truth"])
    section["embedding_cluster_keep_best"] = {
        "n_vecs_total": meta["n_vecs_total"],
        "gen_sec": meta["gen_sec"],
        "ok": res["ok"],
        "query_sec": res["query_sec"],
        "truth_histogram": meta["truth"]["histogram"],
        "got": res["got"],
    }
    print(f"keepbest {scale}: ok={res['ok']} "
          f"gen={meta['gen_sec']}s query={res['query_sec']}s",
          file=sys.stderr)

    existing: dict = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            existing = json.load(fh)
    existing[scale] = section
    with open(ARTIFACT, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps({s: {k: v.get("ok") for k, v in d.items()
                          if isinstance(v, dict)}
                      for s, d in existing.items()}))




# ---------------------------------------------------------------------------
# Corpus 3: planted semantic clusters (embeddings: vec_id, embedding)
#
# embedding_cluster_keep_best bands on COORDINATE SIGNS (8 bands x 8
# bits), so <= 256 clusters can be made pairwise candidate-DISJOINT in
# every band by giving each cluster an injective byte per band. Members
# of a cluster share one sign pattern and differ only by a positive
# scale, so every within-cluster cosine is exactly 1 (>= 0.3 with no
# boundary risk) and the component partition is the planted partition.
# The keeper (argmax floor(norm*1e6 + 0.5)*2^32 + id) is computed at
# generation time by replicating the engine's LEFT-TO-RIGHT double
# accumulation per row, with an asserted margin from every floor
# boundary.


def gen_keepbest(path: str, scale: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if scale == "sf10":  # ~196k vectors, ~235M scored pairs
        sizes = [10] * 100 + [1000] * 50 + [2900] * 50
    elif scale == "sf1":
        sizes = [10] * 100 + [300] * 50 + [900] * 50
    else:
        sizes = [3] * 10 + [7] * 5
    n_clusters = len(sizes)
    assert n_clusters <= 200
    rng = np.random.default_rng(13)
    # injective byte per band per cluster -> zero cross-candidates
    bytes_per_band = np.stack(
        [rng.permutation(256)[:n_clusters] for _ in range(8)]
    )  # (8, C)
    signs = np.zeros((n_clusters, 64), dtype=np.float32)
    for b in range(8):
        for j in range(8):
            bit = (bytes_per_band[b] >> j) & 1
            signs[:, b * 8 + j] = np.where(bit == 1, 1.0, -1.0)

    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "embeddings.parquet")
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    writer = pq.ParquetWriter(f, schema)

    t0 = time.time()
    next_id = 0
    truth_rows = []  # (size, keeper)
    for c, size in enumerate(sizes):
        ids = np.arange(next_id, next_id + size, dtype=np.int64)
        next_id += size
        t = (0.8 + 0.4 * np.arange(size) / max(size - 1, 1)).astype(
            np.float64
        )
        vecs = (t[:, None] * (signs[c] * 0.12)[None, :]).astype(np.float32)
        # engine-order norm: left-to-right float64 accumulation per row
        v64 = vecs.astype(np.float64)
        acc = np.zeros(size, dtype=np.float64)
        for j in range(64):
            acc = acc + v64[:, j] * v64[:, j]
        scaled = np.sqrt(acc) * 1e6 + 0.5
        # The replication above is BIT-identical to the engine's
        # l2_norm (same left-fold of x*x from 0.0, same sqrt/mul/add —
        # all correctly-rounded IEEE ops), so no boundary margin is
        # needed; this tripwire only fires if the operator's
        # accumulation order ever drifts from the replication.
        frac = np.abs(scaled - np.round(scaled))
        assert frac.min() > 1e-9, (c, float(frac.min()))
        q = np.floor(scaled).astype(np.int64)
        keeper = int(ids[np.argmax(q * (1 << 32) + ids)])
        truth_rows.append((size, keeper))
        writer.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        list(vecs), pa.list_(pa.float32())
                    ),
                }
            )
        )
    writer.close()
    hist: dict[int, dict] = {}
    for size, keeper in truth_rows:
        h = hist.setdefault(size, {"n_clusters": 0, "min_keeper": keeper})
        h["n_clusters"] += 1
        h["min_keeper"] = min(h["min_keeper"], keeper)
    truth = [
        {
            "size": s,
            "n_clusters": h["n_clusters"],
            "n_removed": (s - 1) * h["n_clusters"],
            "min_keeper": h["min_keeper"],
        }
        for s, h in sorted(hist.items())
    ]
    return {
        "n_vecs_total": next_id,
        "gen_sec": round(time.time() - t0, 1),
        "truth": {"histogram": truth},
    }


def verify_keepbest(spark, path: str, truth: dict) -> dict:
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    t0 = time.time()
    rows = REGISTRY["embedding_cluster_keep_best"].build(spark, path).collect()
    got = [
        {
            "size": r["size"],
            "n_clusters": r["n_clusters"],
            "n_removed": r["n_removed"],
            "min_keeper": r["min_keeper"],
        }
        for r in rows
    ]
    ok = got == truth["histogram"]
    return {"ok": bool(ok), "got": got, "query_sec": round(time.time() - t0, 1)}


if __name__ == "__main__":
    main()
