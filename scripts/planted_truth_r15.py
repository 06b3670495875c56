#!/usr/bin/env python
"""Round-15 planted-truth refresh (the round-14 verdict's #3/#4 asks):

1. Verified-MinHash pair quality on the planted jaccard corpus:
   PLANTED_TRUTH_r14 measured the UNVERIFIED banding's pair precision
   collapsing 0.96 -> 0.12 -> 0.0014 as noise grows 1k -> 1M -> 10M
   docs (recall 1.0). minhash_dedup_verified adds the exact-Jaccard
   verify stage (the wide-SimHash candidate->VERIFY discipline); this
   rung measures its precision/recall against the same planted truth
   at the same three scales. The planted pairs sit at jaccard
   0.722-0.881 (above the 0.7 verify threshold) and the decoys at
   0.25 (below), so the expected result is recall == the unverified
   form's banding recall and pair precision 1.0.

2. graph_ann_top10 recall@10 after the edge-relation symmetrization
   (recall was 0.6 at sf1/sf10 with DIRECTED edges — the beam
   CONVERGED below the answer because a directed kNN graph is not
   navigable; reverse edges are HNSW's bidirectional links). The
   ann_lsh/ivf rows rerun for artifact continuity (constants
   unchanged since r14).

Usage:  python scripts/planted_truth_r15.py [--scale smoke|sf1|sf10]
                                            [--ops a,b] [--no-ann]
Reuses the /tmp/planted14 corpora; writes PLANTED_TRUTH_r15.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from planted_truth_r13 import gen_jaccard  # noqa: E402
from planted_truth_r14 import (  # noqa: E402
    OUT,
    REAL_DIRS,
    _all_pairs_full,
    _ann_recall,
)

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANTED_TRUTH_r15.json",
)


def _pair_quality(spark, path: str, truth: dict, op_name: str) -> dict:
    """Pair-level recall/precision of a (id, dup_of) clustering op on
    the planted-jaccard corpus (planted_truth_r14's harness with the
    verified-MinHash branches added)."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators import dedup as D
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, path, "documents")
    t0 = time.time()
    if op_name == "minhash":
        clustered = D.minhash_dedup(docs, "text", "doc_id")
    elif op_name == "minhash_verified":
        clustered = D.minhash_dedup_verified(docs, "text", "doc_id")
    elif op_name == "minhash_verified_portable":
        clustered = D.minhash_dedup_verified_portable(docs, "text", "doc_id")
    elif op_name == "simhash_wide":
        clustered = D.simhash_wide_dedup(docs, "text", "doc_id")
    else:
        clustered = D.simhash_dedup(docs, "text", "doc_id")
    small = {
        int(r["doc_id"]): int(r["dup_of"])
        for r in clustered.where(F.col("doc_id") < 1_000_000)
        .select("doc_id", "dup_of")
        .collect()
    }
    mass = (
        clustered.groupBy("dup_of")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("pairs"))
        .collect()[0]["pairs"]
    )
    wall = round(time.time() - t0, 1)

    per_pair = []
    detected = 0
    for p in truth["truth"]["top20"] + truth["truth"].get("rest", []):
        hit = small.get(p["id_a"]) == small.get(p["id_b"])
        detected += int(hit)
        per_pair.append({"jaccard": p["jaccard"], "detected": bool(hit)})
    n_planted = len(per_pair)
    n_decoys = truth.get("decoys", 30)
    decoy_hits = sum(
        1
        for a in range(50, 50 + 2 * n_decoys, 2)
        if small.get(a) is not None and small.get(a) == small.get(a + 1)
    )
    false_pairs = int(mass) - detected
    return {
        "op_sec": wall,
        "planted_pairs": n_planted,
        "detected": detected,
        "recall": round(detected / n_planted, 3) if n_planted else None,
        "per_pair": per_pair,
        "decoy_pairs": n_decoys,
        "decoy_hits": decoy_hits,
        "total_cluster_pairs": int(mass),
        "false_pairs": false_pairs,
        "pair_precision": round(detected / mass, 4) if mass else None,
    }


def main() -> None:
    scale = "smoke"
    ops = ["minhash", "minhash_verified"]
    run_ann = True
    for i, a in enumerate(sys.argv):
        if a == "--scale":
            scale = sys.argv[i + 1]
        if a == "--ops":
            ops = sys.argv[i + 1].split(",")
        if a == "--no-ann":
            run_ann = False

    from healthcare_aihw_etl_pipeline_spark import get_spark

    spark = get_spark()
    section: dict = {"scale": scale}

    path = os.path.join(OUT, f"jaccard_{scale}")
    marker = os.path.join(path, "documents.parquet")
    tpath = os.path.join(path, "truth.json")
    if os.path.exists(marker) and os.path.exists(tpath):
        with open(tpath) as fh:
            truth = json.load(fh)
    else:
        truth = gen_jaccard(path, scale)
        all_pairs = truth["truth"]["top20"]
        truth["truth"]["rest"] = [
            p for p in _all_pairs_full() if p not in all_pairs
        ]
        with open(tpath, "w") as fh:
            json.dump(truth, fh)
    print(f"jaccard corpus: {truth['n_docs_total']} docs", file=sys.stderr)
    for op in ops:
        section[f"{op}_pair_quality"] = _pair_quality(spark, path, truth, op)
        print(
            f"{op}: recall={section[f'{op}_pair_quality']['recall']} "
            f"precision={section[f'{op}_pair_quality']['pair_precision']}",
            file=sys.stderr,
            flush=True,
        )

    if run_ann:
        section["ann_recall"] = {}
        for d in REAL_DIRS.get(scale, []):
            if os.path.isfile(f"{d}/embeddings.parquet"):
                section["ann_recall"][d] = _ann_recall(spark, d)

    art = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            art = json.load(fh)
    art.setdefault(scale, {}).update(section)
    with open(ARTIFACT, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps({k: v for k, v in section.items() if k != "scale"})[:2000])


if __name__ == "__main__":
    main()
