"""Round-11b operator tests: RRF hybrid fusion (vs a pure-Python
replication of both legs), grid-density clustering (vs a brute-force
BFS over the dense-cell graph), winnowing fingerprints (vs a direct
Python implementation of the Schleimer/Wilkerson/Aiken algorithm), and
Theil-Sen robust trend (vs an exact-integer Python median of slopes and
a numpy OLS)."""

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return REGISTRY[name].build(spark, sf).collect()


# ---------------------------------------------------------------------------
# RRF hybrid fusion


def _py_bm25_ranking(depth=50):
    """Pure-Python BM25 leg: same tokenization, same quantization."""
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    toks = {d: t.strip().lower().split() for d, t in docs}
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n_docs
    terms = ["dup", "spark", "merge"]
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for d, t in toks.items():
        dl = len(t)
        s = 0
        matched = False
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            matched = True
            idf = math.log(1.0 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            raw = idf * ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
            s += math.floor(raw * 10000.0 + 0.5)
        if matched:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:depth]
    return {d: i + 1 for i, (d, _) in enumerate(ranked)}


def _py_dense_ranking(depth=50):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(v): np.asarray(e, dtype=np.float64) for v, e in rows}
    q = vecs[0]
    qn = math.sqrt(math.fsum(float(x) * float(x) for x in q))
    cos = {
        v: round(float(np.dot(e, q)) / (float(np.linalg.norm(e)) * qn), 6)
        for v, e in vecs.items()
    }
    ranked = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:depth]
    return {v: i + 1 for i, (v, _) in enumerate(ranked)}


def test_rrf_matches_pure_python(spark):
    got = [
        (r.doc_id, r.r_bm25, r.r_dense, r.rrf_q)
        for r in _rows(spark, "hybrid_rrf_fusion_top10")
    ]
    rb = _py_bm25_ranking()
    rd = _py_dense_ranking()
    fused = {}
    for d in set(rb) | set(rd):
        c = 0
        if d in rb:
            c += 1_000_000_000 // (60 + rb[d])
        if d in rd:
            c += 1_000_000_000 // (60 + rd[d])
        fused[d] = c
    want = [
        (d, rb.get(d), rd.get(d), c)
        for d, c in sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ]
    assert got == want


def test_rrf_output_is_ranked_and_sourced(spark):
    rows = _rows(spark, "hybrid_rrf_fusion_top10")
    assert len(rows) == 10
    qs = [r.rrf_q for r in rows]
    assert qs == sorted(qs, reverse=True)
    for r in rows:
        # Every fused doc must come from at least one leg, and its score
        # must equal the sum of its legs' exact contributions.
        assert r.r_bm25 is not None or r.r_dense is not None
        want = 0
        if r.r_bm25 is not None:
            want += 1_000_000_000 // (60 + r.r_bm25)
        if r.r_dense is not None:
            want += 1_000_000_000 // (60 + r.r_dense)
        assert r.rrf_q == want


# ---------------------------------------------------------------------------
# Grid-density clustering


def _py_grid_clusters():
    rows = duckdb.sql(
        f"SELECT embedding[1], embedding[2] FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    counts = Counter()
    for x, y in rows:
        counts[(math.floor(float(x) / 0.08), math.floor(float(y) / 0.08))] += 1
    dense = {c: n for c, n in counts.items() if n >= 8}
    # BFS over 8-neighbour adjacency.
    seen = set()
    out = []
    B, ENC = 1 << 20, 1 << 21
    cid = lambda c: (c[0] + B) * ENC + (c[1] + B)
    for start in dense:
        if start in seen:
            continue
        comp, queue = [], [start]
        seen.add(start)
        while queue:
            c = queue.pop()
            comp.append(c)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (c[0] + dx, c[1] + dy)
                    if nb in dense and nb not in seen:
                        seen.add(nb)
                        queue.append(nb)
        out.append(
            (
                min(cid(c) for c in comp),
                len(comp),
                sum(dense[c] for c in comp),
            )
        )
    out.sort(key=lambda t: (-t[2], t[0]))
    return out, dense


def test_grid_clusters_match_bruteforce_bfs(spark):
    got = [
        (r.cluster_id, r.n_cells, r.n_points)
        for r in _rows(spark, "grid_density_clusters")
    ]
    want, _ = _py_grid_clusters()
    assert got == want
    assert len(got) > 0


def test_grid_clusters_partition_dense_cells(spark):
    """Clusters partition the dense-cell set: cell and point totals
    across clusters equal the dense-cell totals, and labels are member
    cell ids (min member)."""
    rows = _rows(spark, "grid_density_clusters")
    _, dense = _py_grid_clusters()
    assert sum(r.n_cells for r in rows) == len(dense)
    assert sum(r.n_points for r in rows) == sum(dense.values())


# ---------------------------------------------------------------------------
# Winnowing fingerprints


def _py_winnow_table():
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    per_fp = defaultdict(lambda: [0, 0, None])  # f -> [n_docs, n_occ, first]
    for d, text in docs:
        t = text.strip().lower().split()
        if len(t) < 6:
            continue
        hs = [
            int(hashlib.md5(" ".join(t[i : i + 3]).encode()).hexdigest()[:8], 16)
            for i in range(len(t) - 2)
        ]
        fps = Counter(
            min(hs[s : s + 4]) for s in range(len(hs) - 3)
        )
        for f, c in fps.items():
            e = per_fp[f]
            e[0] += 1
            e[1] += c
            e[2] = d if e[2] is None else min(e[2], d)
    rows = [(f, n, occ, fd) for f, (n, occ, fd) in per_fp.items()]
    rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return rows[:20]


def test_winnow_matches_pure_python(spark):
    got = [
        (r.fingerprint, r.n_docs, r.n_occurrences, r.first_doc)
        for r in _rows(spark, "winnow_shared_fingerprints")
    ]
    assert got == _py_winnow_table()
    assert len(got) == 20


def test_winnow_shared_signal_exists(spark):
    """The corpus has boilerplate/near-dup docs, so at least one
    fingerprint must be shared by more than one document — otherwise
    the query degenerates and proves nothing."""
    rows = _rows(spark, "winnow_shared_fingerprints")
    assert rows[0].n_docs > 1


# ---------------------------------------------------------------------------
# Theil-Sen robust trend


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (Spark div / DuckDB // semantics —
    Python's // floors, which differs on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def test_theil_sen_matches_exact_python(spark):
    [r] = _rows(spark, "theil_sen_daily_trend")
    daily = duckdb.sql(
        f"""
        SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS x,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM '{SF}/orders.parquet' GROUP BY o_orderdate ORDER BY x
        """
    ).fetchall()
    xs = [int(x) for x, _ in daily]
    rs = [int(v) for _, v in daily]
    n = len(xs)
    slopes = sorted(
        _trunc_div((rs[j] - rs[i]) * 1_000_000, xs[j] - xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    np_pairs = n * (n - 1) // 2
    assert r.n_days == n
    assert r.n_pairs == np_pairs
    # Lower median: the ((np+1) div 2)-th smallest slope.
    assert r.theil_sen_slope_micro == slopes[(np_pairs + 1) // 2 - 1]
    slope, _ = np.polyfit(np.asarray(xs, float), np.asarray(rs, float), 1)
    assert math.isclose(r.ols_slope, float(slope), rel_tol=1e-6)


def test_theil_sen_trunc_div_semantics(spark):
    """Spark's div must truncate toward zero exactly like the Python
    reference used in the cross-check (and DuckDB's //)."""
    row = spark.sql(
        "SELECT -7 div 2 AS a, 7 div 2 AS b, -7 div -2 AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (-3, 3, 3)
    assert (_trunc_div(-7, 2), _trunc_div(7, 2)) == (-3, 3)
