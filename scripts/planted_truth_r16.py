#!/usr/bin/env python
"""Round-16 planted-truth refresh (the round-15 verdict's #5 ask, plus
continuity rows for the ops whose code moved this round).

1. ANN recall rung on a STRUCTURED planted corpus. PLANTED_TRUTH_r15's
   smoke row read recall@10 0.5/0.8/0.6 (lsh/ivf/graph) on the
   2000-vector sf0.1 layout — but those vectors are i.i.d. random, so
   the "true top-10" are the winners of a 2000-way coin flip with no
   similarity gradient: bucketed/beamed methods correctly refuse to
   distinguish cos 0.31 from cos 0.29, and the rung was grading noise
   while reading as a quality regression. This round plants the
   structure the ops are FOR (the minhash planted-corpus discipline):
   the query vector gets a 12-member planted cluster at cos ~0.95
   (pairwise distinct margins), over a background of i.i.d. noise
   vectors at cos ~N(0, 1/8). Every method that buckets or beams by
   similarity must recover the cluster — recall grades the operator,
   not the layout. The real-corpus rows stay for continuity (their
   random-layout recall is the documented per-layout bound; sf1/sf10
   replicated layouts DO have structure — exact replicas — and
   already read 1.0).

2. Verified-MinHash pair-quality rows rerun (same corpora/constants as
   r15) because round 16 refactored the candidate pairing into
   _band_candidates (the r15 ADVICE dedup fix) — the rung re-proves
   precision/recall through the new code path.

Usage:  python scripts/planted_truth_r16.py [--scale smoke|sf1|sf10]
                                            [--ops a,b] [--no-ann]
Reuses the /tmp/planted14 corpora; writes PLANTED_TRUTH_r16.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from planted_truth_r13 import gen_jaccard  # noqa: E402
from planted_truth_r14 import (  # noqa: E402
    OUT,
    REAL_DIRS,
    _all_pairs_full,
    _ann_recall,
)
from planted_truth_r15 import _pair_quality  # noqa: E402

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANTED_TRUTH_r16.json",
)

_ANN_DIM = 64
_ANN_N = 2000
_ANN_CLUSTER = 12  # query + 11 siblings: top-10 sits inside the cluster


def gen_ann_clustered(path: str, seed: int = 1606) -> str:
    """Planted-structure embedding corpus at the smoke scale: vec_id 0
    plus {_ANN_CLUSTER}-1 siblings drawn around one unit center with
    noise of TOTAL norm ~0.1 (per-coordinate sigma 0.1/sqrt(dim) — a
    64-dim Gaussian's norm concentrates at sigma*sqrt(dim), so the
    per-coordinate scale must divide it out; at noise norm s the
    member cosines sit near 1/(1+s^2) ~ 0.99 with pairwise-distinct
    margins after 6dp rounding). Background = i.i.d. Gaussian unit
    vectors (cos ~ N(0, 1/sqrt(dim)) — a clean gradient to the
    cluster: ~12 sigma of separation). Same schema as the bench
    embeddings table (vec_id int64, embedding list<float>, label
    int32: cluster flag). Deterministic in the seed; rewrites only if
    missing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(path, "embeddings.parquet")
    if os.path.exists(out):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    center = rng.standard_normal(_ANN_DIM)
    center /= np.linalg.norm(center)
    cluster = center[None, :] + (0.1 / _ANN_DIM**0.5) * rng.standard_normal(
        (_ANN_CLUSTER, _ANN_DIM)
    )
    cluster /= np.linalg.norm(cluster, axis=1, keepdims=True)
    noise = rng.standard_normal((_ANN_N - _ANN_CLUSTER, _ANN_DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    M = np.vstack([cluster, noise]).astype(np.float32)
    labels = np.array(
        [1] * _ANN_CLUSTER + [0] * (_ANN_N - _ANN_CLUSTER), dtype=np.int32
    )
    ids = np.arange(_ANN_N, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(
                [row.tolist() for row in M],
                type=pa.list_(pa.float32()),
            ),
            "label": labels,
        }
    )
    pq.write_table(tbl, out)
    return path


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
        dirs = list(REAL_DIRS.get(scale, []))
        if scale == "smoke":
            dirs.insert(
                0, gen_ann_clustered(os.path.join(OUT, "ann_clustered"))
            )
        for d in dirs:
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
