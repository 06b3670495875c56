"""Round-14 tests: graph-based ANN search over the kNN graph.

The oracle hash check (driver-side) proves the Spark search replays the
unrolled DuckDB CTE bit-for-bit; these tests pin the laws the hash
can't see — retrieval QUALITY vs the exact brute-force answer, the
bounded-visited contract, and output-shape invariants.
"""

from __future__ import annotations

import numpy as np
import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def ga_rows(spark, sf_dir):
    return REGISTRY["graph_ann_top10"].build(spark, sf_dir).collect()


def _brute_topk(sf_dir: str, k: int) -> list[int]:
    """Exact quantized-dot top-k for probe vec_id=0, pure numpy —
    independent of both engines."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64) * 127.0
    Q = (np.sign(M) * np.floor(np.abs(M) + 0.5)).astype(np.int64)
    dots = Q @ Q[ids == 0][0]
    order = np.lexsort((ids, -dots))[:k]
    return ids[order].tolist()


def test_graph_ann_shape_and_order(ga_rows):
    """Ranks are 1..10; ordering is (qdot desc, vec_id asc); the probe
    itself (vec_id 0, the maximal self-dot) leads."""
    assert [r.rank for r in ga_rows] == list(range(1, 11))
    keys = [(-r.qdot, r.vec_id) for r in ga_rows]
    assert keys == sorted(keys)
    assert ga_rows[0].vec_id == 0


def test_graph_ann_recall_vs_brute(ga_rows, sf_dir):
    """Beam search over the k=5 NN graph from 64 stride-spread entries
    must recover most of the exact top-10 (measured: 1.0 at sf0.001,
    0.9 at sf0.01, 0.5 at sf0.1 — the graph gets sparser relative to
    corpus clusters as N grows with k fixed, the expected HNSW-without-
    upper-layers behavior). Floor set at 0.5 for the test corpus."""
    got = {r.vec_id for r in ga_rows}
    brute = set(_brute_topk(sf_dir, 10))
    recall = len(got & brute) / 10
    assert recall >= 0.5, (recall, sorted(got), sorted(brute))


def test_graph_ann_scores_exact(ga_rows, sf_dir):
    """Every returned qdot equals the numpy exact quantized dot —
    the search may miss a neighbor (approximate) but may never
    mis-score one it returns."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64) * 127.0
    Q = (np.sign(M) * np.floor(np.abs(M) + 0.5)).astype(np.int64)
    probe = Q[ids == 0][0]
    lookup = {int(i): int(d) for i, d in zip(ids, Q @ probe)}
    for r in ga_rows:
        assert lookup[r.vec_id] == r.qdot, r


# ---------------------------------------------------------------------------
# Wide (120-bit) verified SimHash


def test_simhash_wide_contract_laws(spark, sf_dir):
    """Two laws the oracle hash can't isolate: (a) VERIFY — no dup_of
    link may join signatures farther than max_hamming apart (the
    60-bit form violates this by construction: shared band is a
    superset of hamming<=3); (b) PIGEONHOLE — every signature pair
    within hamming 3 MUST be co-clustered (4 intact-band guarantee)."""
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        simhash_wide_dedup,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = simhash_wide_dedup(docs, "text", "doc_id").collect()
    sig = {r.doc_id: (r.h0, r.h1) for r in rows}
    dup = {r.doc_id: r.dup_of for r in rows}

    def ham(a, b):
        return bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
            sig[a][1] ^ sig[b][1]
        ).count("1")

    # (a) verify: every non-self link is within the threshold
    linked = [(d, r) for d, r in dup.items() if r != d]
    assert linked, "corpus has near-dups; the op should find some"
    for d, r in linked:
        assert ham(d, r) <= 8, (d, r, ham(d, r))
    # (b) pigeonhole: for any pair within hamming 3 the two docs share
    # a band (4-band guarantee), so the LARGER id's verified partner
    # set contains the smaller — its link is at most that id. (Star
    # policy links each doc to its SMALLEST verified partner and makes
    # no transitive-closure claim — closure is
    # dedup_transitive_clusters' job, as with the 60-bit form.)
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if ham(a, b) <= 3:
                assert dup[b] <= a, (a, b, dup[b])


def test_simhash_wide_identical_collapse(spark):
    """Signature-identical docs (byte-identical text) collapse to one
    representative regardless of count — the hub guard."""
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        simhash_wide_dedup,
    )

    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(50)]
    rows += [(100 + i, f"unique{i} token{i} one{i} two{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.dup_of for r in simhash_wide_dedup(df, "text", "doc_id").collect()}
    assert all(got[i] == 0 for i in range(50))
    assert all(got[100 + i] == 100 + i for i in range(5))
