"""Round-13 tests: the silver-served sweep twins must be column-exact
equal to their from-scratch forms (the materialization cannot change a
single value), and the silver table must rebuild when the source
events parquet is newer than the materialization."""

import os
import time

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

_PAIRS = [
    ("interval_sweep_profile_served", "interval_sweep_profile"),
    ("max_concurrent_sessions_served", "max_concurrent_sessions"),
    ("interval_union_coverage_served", "interval_union_coverage"),
]


def _collect(spark, name):
    df = REGISTRY[name].build(spark, SF)
    return df.columns, sorted(map(tuple, df.collect()))


def test_served_twins_match_from_scratch(spark):
    for served, original in _PAIRS:
        sc, sr = _collect(spark, served)
        oc, orows = _collect(spark, original)
        assert sc == oc, (served, sc, oc)
        assert sr == orows, served


def test_served_segments_rebuild_on_stale_source(spark, tmp_path):
    import shutil
    import tempfile

    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        served_boundary_segments,
    )

    # Work on a COPY of the sf0.001 corpus (testdata is read-only to us)
    # so touching the source's mtime is safe.
    sf = tmp_path / "sf_copy"
    sf.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), sf / "events.parquet")
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_sweep_segments", "sf_copy"
    )
    # The base path is keyed on basename(sf_dir) = "sf_copy", which a
    # previous test run also used — start from a clean slate.
    shutil.rmtree(base, ignore_errors=True)

    def versions() -> list[str]:
        return sorted(
            d for d in os.listdir(base)
            if d.startswith("v=")
            and os.path.exists(os.path.join(base, d, "_SUCCESS"))
        )

    stale_handle = served_boundary_segments(spark, str(sf))
    n_first = stale_handle.count()
    v1 = versions()
    assert len(v1) == 1
    # Source newer than the materialization -> NEW version dir on next
    # access; the superseded snapshot stays on disk so the lazy handle
    # resolved before the rebuild still reads consistent data.
    future = time.time() + 60
    os.utime(sf / "events.parquet", (future, future))
    served_boundary_segments(spark, str(sf)).collect()
    v2 = versions()
    assert len(v2) == 2 and v1[0] in v2
    assert stale_handle.count() == n_first  # snapshot isolation
    # A third rebuild prunes the oldest version (retention = 2).
    os.utime(sf / "events.parquet", (future + 60, future + 60))
    served_boundary_segments(spark, str(sf)).collect()
    v3 = versions()
    assert len(v3) == 2 and v1[0] not in v3


# ---------------------------------------------------------------------------
# kNN-graph construction


def test_knn_graph_matches_numpy_replication(spark):
    """Full bit-replication of the banded-LSH kNN graph in numpy,
    independent of both engines' SQL: quantize, signatures, candidate
    union across the two bands, exact integer dots, per-src top-5."""
    import duckdb
    import numpy as np

    from healthcare_aihw_etl_pipeline_spark.plans.round13_queries import (
        _KNN_K,
        _knn_planes,
    )
    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        qlsh_signs,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    # round-half-away-from-zero to match both engines (numpy's own
    # np.round rounds halves to even):
    q = np.sign(emb * 127.0).astype(np.int64) * np.floor(
        np.abs(emb * 127.0) + 0.5
    ).astype(np.int64)
    p = _knn_planes(len(ids))
    signs = np.array(qlsh_signs(2 * p, 64), dtype=np.int64)
    dots = q @ signs.T  # (n, 2p)
    bits = (dots > 0).astype(np.int64)
    weights = np.array([1 << (j % p) for j in range(2 * p)], dtype=np.int64)
    sig0 = (bits[:, :p] * weights[:p]).sum(axis=1)
    sig1 = (bits[:, p:] * weights[p : 2 * p]).sum(axis=1)
    expected = {}
    gram = q @ q.T
    for i in range(len(ids)):
        cand = np.where(
            ((sig0 == sig0[i]) | (sig1 == sig1[i])) & (ids != ids[i])
        )[0]
        scored = sorted(
            ((int(gram[i, j]), int(ids[j])) for j in cand),
            key=lambda t: (-t[0], t[1]),
        )[:_KNN_K]
        for r, (dot, nbr) in enumerate(scored, start=1):
            expected[(int(ids[i]), r)] = (nbr, dot)
    got = {
        (r["src"], r["rank"]): (r["nbr"], r["qdot"])
        for r in REGISTRY["knn_graph_topk"].build(spark, SF).collect()
    }
    assert got == expected


def test_knn_graph_degree_and_symmetry(spark):
    """Structural laws: per-src degree <= k with dense ranks 1..deg, no
    self-edges, and qdot is symmetric wherever both directions appear."""
    from healthcare_aihw_etl_pipeline_spark.plans.round13_queries import (
        _KNN_K,
    )

    rows = REGISTRY["knn_graph_topk"].build(spark, SF).collect()
    by_src = {}
    dots = {}
    for r in rows:
        assert r["src"] != r["nbr"]
        by_src.setdefault(r["src"], []).append(r["rank"])
        dots[(r["src"], r["nbr"])] = r["qdot"]
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= _KNN_K
    for (a, b), d in dots.items():
        if (b, a) in dots:
            assert dots[(b, a)] == d


# ---------------------------------------------------------------------------
# Unigram-LM pruning


def test_unigram_lm_prune_matches_bruteforce(spark):
    """Independent replication from raw text in plain Python: substring
    seed counts, quantized ln scores (math.log — same doubles), and a
    BRUTE-FORCE enumeration of every segmentation per word (words are
    short) instead of the engine's DP. Among equal-score segmentations
    the engine's backtrack takes the shortest piece first FROM THE END,
    i.e. the reversed piece-length tuple is lexicographically minimal —
    replicated here by sorting the enumerated candidates."""
    import math
    from collections import Counter

    import duckdb

    from healthcare_aihw_etl_pipeline_spark.plans.round13_queries import (
        _UNI_CAP,
        _UNI_MAXP,
        _UNI_PRUNE,
        _UNI_TOPM,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet' WHERE trim(text) <> ''"
        ).fetchall()
    ]
    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w and len(w) <= _UNI_CAP:
                words[w] += 1
    pieces = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(1, min(_UNI_MAXP, len(w) - i) + 1):
                pieces[w[i : i + l]] += n
    multi = sorted(
        ((p, c) for p, c in pieces.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:_UNI_TOPM]
    vocab = {p: c for p, c in pieces.items() if len(p) == 1}
    vocab.update(dict(multi))
    total = sum(vocab.values())
    score = {
        p: math.floor(math.log(c / total) * 1e6 + 0.5)
        for p, c in vocab.items()
    }

    def segmentations(w, skip_whole):
        if w == "":
            yield []
            return
        for l in range(1, min(_UNI_MAXP, len(w)) + 1):
            head, rest = w[:l], w[l:]
            if head not in score:
                continue
            if skip_whole and rest == "" and l == len(w):
                continue
            for tail in segmentations(rest, False):
                yield [head] + tail

    def viterbi(w, skip_whole=False):
        best = None
        for seg in segmentations(w, skip_whole):
            sc = sum(score[p] for p in seg)
            key = (-sc, tuple(len(p) for p in reversed(seg)))
            if best is None or key < best[0]:
                best = (key, seg)
        return (sum(score[p] for p in best[1]), best[1]) if best else (None, [])

    usage = Counter()
    for w, n in words.items():
        _, seg = viterbi(w)
        for p in seg:
            usage[p] += n
    rows = []
    for p, c in vocab.items():
        if len(p) == 1:
            continue
        alt, _ = viterbi(p, skip_whole=True)
        rows.append(
            (p, c, usage.get(p, 0), score[p], alt, usage.get(p, 0) * (score[p] - alt))
        )
    rows.sort(key=lambda r: (r[5], r[0]))
    expected = rows[:_UNI_PRUNE]
    got = [
        tuple(r)
        for r in REGISTRY["unigram_lm_prune"].build(spark, SF).collect()
    ]
    assert got == expected
    assert all(r[5] >= 0 for r in got)  # loss >= 0 is a theorem here


def test_mutual_knn_dedup_matches_python_replication(spark):
    """Mutual-kNN clusters replicated independently: reuse the engine's
    ranked edge output (already numpy-verified above), apply the
    mutuality + tau rule in plain Python, and close with union-find."""
    from healthcare_aihw_etl_pipeline_spark.plans.round13_queries import (
        _MUTUAL_TAU,
    )

    edges = {
        (r["src"], r["nbr"]): r["qdot"]
        for r in REGISTRY["knn_graph_topk"].build(spark, SF).collect()
    }
    mutual = [
        (a, b)
        for (a, b), d in edges.items()
        if a < b and d >= _MUTUAL_TAU and (b, a) in edges
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in mutual:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expected = sorted(
        (c, len(ms), max(ms)) for c, ms in comps.items()
    )
    got = [
        (r["component"], r["n_vecs"], r["max_vec"])
        for r in REGISTRY["mutual_knn_dedup_clusters"].build(spark, SF).collect()
    ]
    assert got == expected
    assert len(got) > 0  # degenerate-coverage guard


# ---------------------------------------------------------------------------
# DSIR importance resampling


def test_dsir_importance_matches_python_replication(spark):
    """Independent Python replication from raw text: hashlib.md5
    feature buckets, add-1-smoothed quantized ln ratios (math.log on
    the same doubles), exact per-doc integer sums, top-20 under the
    (weight desc, doc_id) total order."""
    import hashlib
    import math
    from collections import Counter

    import duckdb

    from healthcare_aihw_etl_pipeline_spark.plans.round13_queries import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_LANG,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, source, lang, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()

    def buckets(text):
        t = text.strip().lower().split()
        feats = list(t) + [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % _DSIR_BUCKETS
            for f in feats
        ]

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc = {}
    meta = {}
    for doc_id, source, lang, text in rows:
        bs = buckets(text)
        per_doc[doc_id] = bs
        meta[doc_id] = (source, lang)
        raw.update(bs)
        if lang == _DSIR_TARGET_LANG:
            tgt.update(bs)
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())

    def lp(c, t):
        return math.floor(
            math.log((c + 1.0) / (t + float(_DSIR_BUCKETS))) * 1e6 + 0.5
        )

    lr = {b: lp(tgt.get(b, 0), t_tgt) - lp(c, t_raw) for b, c in raw.items()}
    scored = sorted(
        (
            (
                doc_id,
                meta[doc_id][0],
                meta[doc_id][1],
                len(bs),
                sum(lr[b] for b in bs),
            )
            for doc_id, bs in per_doc.items()
        ),
        key=lambda r: (-r[4], r[0]),
    )[:20]
    got = [
        tuple(r)
        for r in REGISTRY["dsir_importance_top20"].build(spark, SF).collect()
    ]
    assert got == scored
    # the target-domain docs should dominate the top of the ranking
    assert sum(1 for r in got if r[2] == _DSIR_TARGET_LANG) >= 15


# ---------------------------------------------------------------------------
# BPE encoding (apply step)


def test_bpe_encode_stats_matches_python(spark):
    """Train with the test suite's independent Sennrich loop
    (tests/test_round12._py_bpe), apply the merges greedily
    non-overlapping to every (source, word) occurrence, and compare the
    per-source compression accounting exactly."""
    import re
    from collections import Counter

    import duckdb

    from tests.test_round12 import _py_bpe

    merges = _py_bpe()
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    pat = re.compile(r"^[a-z]{2,16}$")

    def encode(w):
        syms = list(w)
        for _rnd, a, b, _m, _c in merges:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    enc_cache: dict = {}
    agg: dict = {}
    for source, text in rows:
        for w in text.strip().lower().split():
            if not pat.fullmatch(w):
                continue
            if w not in enc_cache:
                enc_cache[w] = encode(w)
            occ, chars, toks = agg.get(source, (0, 0, 0))
            agg[source] = (occ + 1, chars + len(w), toks + enc_cache[w])
    expected = sorted((s, *v) for s, v in agg.items())
    got = [
        tuple(r)
        for r in REGISTRY["bpe_encode_stats"].build(spark, SF).collect()
    ]
    assert got == expected
    # structural law: merges only shrink, one token per char at worst,
    # at least one token per word occurrence
    for _s, occ, chars, toks in got:
        assert occ <= toks <= chars
