#!/usr/bin/env python
"""Planted-truth rung for the duplicate-SPAN family (dup_span_stats):
EXACT evidence above oracle-feasible scale, the round-12/13 discipline
applied to the round-14 span-merge operator.

Constructed corpus with the duplicated spans known by construction:

- 50 planted documents (25 A/B pairs). Pair pi shares exactly two
  token spans: S1 (40 tokens, ``p{pi}x*``) and S2 (24 tokens,
  ``p{pi}y*``) — pair-private token alphabets, so the only duplicated
  8-grams anywhere in the corpus are the ones fully inside a shared
  span. Every other token in a planted doc is globally unique, so
  boundary-crossing grams never duplicate, and each doc's marked
  positions merge into EXACTLY two islands covering 40 + 24 = 64
  tokens (two marked starts merge only when <= K apart; the 1-token
  unique gap keeps the islands separate — gap math in the operator's
  doc). Planted doc j (j = 0..49) gets n_tokens = 100 + j, so
  dup_ppm = 64e6 // (100+j) is strictly decreasing: the expected
  top-20 is doc_ids 0..19 with every column value known exactly.
- Noise: {smoke: 1k, sf1: 1M, sf10: 10M} documents of 10 globally
  unique tokens each — every noise doc clears the >= K filter and
  feeds 3 unique 8-grams into the duplicated-gram detection, so the
  scale pressure is on the REAL pipeline (hashing + the (hash, doc)
  aggregate), not bypassed by a length gate.

Truth check: dup_span_stats' top-20 must equal the constructed
expectation on all six columns, values AND order.

Usage:  python scripts/planted_truth_r14b.py --scale smoke|sf1|sf10
Appends a "dup_span" section per scale to PLANTED_TRUTH_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/planted14"
ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANTED_TRUTH_r14.json",
)

_K = 8
_L1, _L2 = 40, 24
_NOISE = {"sf10": 10_000_000, "sf1": 1_000_000}


def gen_dup_spans(path: str, scale: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    noise = _NOISE.get(scale, 1_000)
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "documents.parquet")
    writer = pq.ParquetWriter(
        f, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    t0 = time.time()
    ids, txt, truth = [], [], []
    for j in range(50):
        pi, side = divmod(j, 2)
        n_tokens = 100 + j
        s1 = " ".join(f"p{pi}x{t}" for t in range(_L1))
        s2 = " ".join(f"p{pi}y{t}" for t in range(_L2))
        n_uniq = n_tokens - _L1 - _L2
        pre = " ".join(f"u{j}a{t}" for t in range(n_uniq - 2))
        mid = f"u{j}m0"  # 1-token gap: islands stay separate (gap>=1)
        tail = f"u{j}z0"
        ids.append(j)
        txt.append(" ".join([pre, s1, mid, s2, tail]))
        truth.append(
            {
                "doc_id": j,
                "n_tokens": n_tokens,
                "n_spans": 2,
                "dup_tokens": _L1 + _L2,
                "max_span": _L1,
                "dup_ppm": (_L1 + _L2) * 1_000_000 // n_tokens,
            }
        )
    writer.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(txt, pa.string()),
            }
        )
    )
    base, chunk = 1_000_000, 1_000_000
    for s0 in range(0, noise, chunk):
        sn = min(chunk, noise - s0)
        nid = np.arange(base + s0, base + s0 + sn)
        u = nid.astype("U12")
        text = np.char.add("m", u)
        for sfx in (" ma", " mb", " mc", " md", " me", " mf", " mg",
                    " mh", " mi"):
            text = np.char.add(text, np.char.add(sfx, u))
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(nid, pa.int64()),
                    "text": pa.array(text.tolist(), pa.string()),
                }
            )
        )
    writer.close()
    return {
        "n_docs_total": 50 + noise,
        "gen_sec": round(time.time() - t0, 1),
        "top20": truth[:20],
    }


def main() -> None:
    scale = "smoke"
    for i, a in enumerate(sys.argv):
        if a == "--scale":
            scale = sys.argv[i + 1]

    from healthcare_aihw_etl_pipeline_spark import get_spark
    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    spark = get_spark()
    path = os.path.join(OUT, f"dupspan_{scale}")
    tpath = os.path.join(path, "truth.json")
    if os.path.exists(os.path.join(path, "documents.parquet")) and (
        os.path.exists(tpath)
    ):
        with open(tpath) as fh:
            truth = json.load(fh)
    else:
        truth = gen_dup_spans(path, scale)
        with open(tpath, "w") as fh:
            json.dump(truth, fh)
    print(f"dup-span corpus: {truth['n_docs_total']} docs", file=sys.stderr)

    t0 = time.time()
    rows = REGISTRY["dup_span_stats"].build(spark, path).collect()
    wall = round(time.time() - t0, 1)
    got = [
        {
            "doc_id": r.doc_id,
            "n_tokens": r.n_tokens,
            "n_spans": r.n_spans,
            "dup_tokens": r.dup_tokens,
            "max_span": r.max_span,
            "dup_ppm": r.dup_ppm,
        }
        for r in rows
    ]
    exact = got == truth["top20"]
    section = {
        "n_docs_total": truth["n_docs_total"],
        "gen_sec": truth["gen_sec"],
        "query_sec": wall,
        "exact_top20_match": exact,
        "top20": got,
    }
    if not exact:
        section["expected"] = truth["top20"]

    art = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            art = json.load(fh)
    art.setdefault(scale, {})["dup_span"] = section
    with open(ARTIFACT, "w") as fh:
        json.dump(art, fh, indent=1)
    print(
        json.dumps(
            {k: v for k, v in section.items() if k not in ("top20",)}
        )
    )
    if not exact:
        sys.exit(1)


if __name__ == "__main__":
    main()
