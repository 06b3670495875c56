"""Round-14 continuation tests: duplicate-span stats, BH-FDR,
regression discontinuity, association rules, Markov attribution.

The driver-side oracle hash proves each Spark plan replays its DuckDB
SQL bit-for-bit; these tests pin what the hash can't see — an
INDEPENDENT pure-Python replication of each algorithm from the raw
parquet, plus the structural laws of each statistic.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb
import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

_DS_K = 8


# ---------------------------------------------------------------------------
# dup_span_stats


def _py_dup_spans(sf_dir: str) -> list[tuple]:
    """Pure-Python duplicate-span replication: tokenize, 8-gram 60-bit
    md5, cross-document duplicated-gram set, per-doc maximal span
    merge. Independent of both engines."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    grams: dict[int, list[tuple[int, int]]] = {}  # doc -> [(pos, h)]
    ntok: dict[int, int] = {}
    docs_of: dict[int, set[int]] = defaultdict(set)
    for doc_id, text in rows:
        if text is None or text.strip() == "":
            continue
        t = re.split(r"\s+", text.strip().lower())
        if len(t) < _DS_K:
            continue
        ntok[doc_id] = len(t)
        hs = []
        for i in range(len(t) - _DS_K + 1):
            g = " ".join(t[i : i + _DS_K])
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            hs.append((i, h))
            docs_of[h].add(doc_id)
        grams[doc_id] = hs
    dup = {h for h, ds in docs_of.items() if len(ds) >= 2}
    out = []
    for doc_id, hs in grams.items():
        marked = sorted(p for p, h in hs if h in dup)
        if not marked:
            continue
        spans = []
        start = prev = marked[0]
        for p in marked[1:]:
            if p - prev > _DS_K:
                spans.append(prev - start + _DS_K)
                start = p
            prev = p
        spans.append(prev - start + _DS_K)
        dup_tokens = sum(spans)
        out.append(
            (
                doc_id,
                ntok[doc_id],
                len(spans),
                dup_tokens,
                max(spans),
                dup_tokens * 1000000 // ntok[doc_id],
            )
        )
    out.sort(key=lambda r: (-r[5], r[0]))
    return out[:20]


@pytest.fixture(scope="module")
def ds_rows(spark, sf_dir):
    return REGISTRY["dup_span_stats"].build(spark, sf_dir).collect()


def test_dup_span_matches_python(ds_rows, sf_dir):
    got = [
        (r.doc_id, r.n_tokens, r.n_spans, r.dup_tokens, r.max_span, r.dup_ppm)
        for r in ds_rows
    ]
    assert got == _py_dup_spans(sf_dir)


def test_dup_span_laws(ds_rows):
    """Spans are bounded by the document: the merged-island covered
    tokens can never exceed the token count, the longest span never
    exceeds the total, and each reported doc has >= 1 span of >= K."""
    assert len(ds_rows) > 0
    for r in ds_rows:
        assert 0 < r.dup_tokens <= r.n_tokens
        assert _DS_K <= r.max_span <= r.dup_tokens
        assert r.n_spans >= 1
        assert r.dup_ppm == r.dup_tokens * 1000000 // r.n_tokens


# ---------------------------------------------------------------------------
# bh_fdr_nation_tests


def _py_bh(sf_dir: str) -> list[tuple]:
    """Welch z + A&S 26.2.17 tail + BH step-up, replicated from the
    raw parquet with Python floats (same IEEE op order as the shared
    SQL expression)."""
    rows = duckdb.sql(
        f"""
        SELECT n_name, COUNT(*) AS n,
               SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
               SUM(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS HUGEINT)
                   * CAST(round(c_acctbal * 100) AS BIGINT)) AS ss
        FROM '{sf_dir}/customer.parquet' c
        JOIN '{sf_dir}/nation.parquet' nn ON n_nationkey = c_nationkey
        GROUP BY n_name
        """
    ).fetchall()
    tot_n = sum(r[1] for r in rows)
    tot_s = sum(r[2] for r in rows)
    tot_ss = sum(r[3] for r in rows)
    recs = []
    for name, n, s, ss in rows:
        nr, sr, ssr = tot_n - n, tot_s - s, tot_ss - ss
        z = (float(s) / float(n) - float(sr) / float(nr)) / math.sqrt(
            (float(ss) - float(s) * float(s) / float(n))
            / (float(n) - 1.0)
            / float(n)
            + (float(ssr) - float(sr) * float(sr) / float(nr))
            / (float(nr) - 1.0)
            / float(nr)
        )
        az = abs(z)
        tt = 1.0 / (1.0 + 0.2316419 * az)
        p = (
            2.0
            * (0.3989422804014327 * math.exp(-0.5 * az * az))
            * tt
            * (
                0.319381530
                + tt
                * (
                    -0.356563782
                    + tt
                    * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))
                )
            )
        )
        recs.append(
            (
                name,
                n,
                math.floor(z * 10000.0 + 0.5),
                math.floor(p * 1000000000.0 + 0.5),
            )
        )
    recs.sort(key=lambda r: (r[3], r[0]))
    m = len(recs)
    k_star = max(
        (i + 1 for i, r in enumerate(recs) if r[3] * m * 20 <= (i + 1) * 10**9),
        default=0,
    )
    return [
        (name, n, zq, pppb, i + 1, 1 if i + 1 <= k_star else 0)
        for i, (name, n, zq, pppb) in enumerate(recs)
    ]


@pytest.fixture(scope="module")
def bh_rows(spark, sf_dir):
    return REGISTRY["bh_fdr_nation_tests"].build(spark, sf_dir).collect()


def test_bh_fdr_matches_python(bh_rows, sf_dir):
    got = [
        (r.n_name, r.n, r.z_q, r.p_ppb, r.p_rank, r.rejected)
        for r in bh_rows
    ]
    assert got == _py_bh(sf_dir)


def test_bh_fdr_laws(bh_rows):
    """BH rejects a PREFIX of the p-ranked tests; p is a valid
    two-sided tail (ppb in [0, 2e9]); ranks are 1..m."""
    assert [r.p_rank for r in bh_rows] == list(range(1, len(bh_rows) + 1))
    ps = [r.p_ppb for r in bh_rows]
    assert ps == sorted(ps)
    assert all(0 <= p <= 2_000_000_001 for p in ps)
    flags = [r.rejected for r in bh_rows]
    # prefix property: no rejected test after an accepted one
    assert flags == sorted(flags, reverse=True)


# ---------------------------------------------------------------------------
# rdd_order_value


def _py_rdd(sf_dir: str):
    import datetime as dt

    cut = dt.date(1997, 6, 1)
    rows = duckdb.sql(
        f"SELECT o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    mom = {"l": [0, 0, 0, 0, 0], "r": [0, 0, 0, 0, 0]}
    for d, y in rows:
        if isinstance(d, dt.datetime):
            d = d.date()
        x = (d - cut).days
        if not (-120 <= x < 120):
            continue
        side = "l" if x < 0 else "r"
        m = mom[side]
        m[0] += 1
        m[1] += x
        m[2] += x * x
        m[3] += y
        m[4] += x * y

    def fit(m):
        n, sx, sxx, sy, sxy = map(float, m)
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        return b, a

    bl, al = fit(mom["l"])
    br, ar = fit(mom["r"])
    return (
        mom["l"][0],
        mom["r"][0],
        math.floor((ar - al) * 10000.0 + 0.5),
        math.floor(bl * 1000000.0 + 0.5),
        math.floor(br * 1000000.0 + 0.5),
    )


def test_rdd_matches_python(spark, sf_dir):
    r = REGISTRY["rdd_order_value"].build(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    n_l, n_r, jump, bl, br = _py_rdd(sf_dir)
    assert (r.n_left, r.n_right) == (n_l, n_r)
    # one-quantum tolerance: Python's left-to-right float evaluation
    # can differ from the SQL engines' by one ulp at the floor boundary
    assert abs(r.jump_q - jump) <= 1
    assert abs(r.slope_left_q - bl) <= 1
    assert abs(r.slope_right_q - br) <= 1


# ---------------------------------------------------------------------------
# assoc_rules_top20


def _py_assoc(sf_dir: str) -> list[tuple]:
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    baskets: dict[int, list[int]] = defaultdict(list)
    supp: dict[int, int] = defaultdict(int)
    for o, p in rows:
        baskets[o].append(p)
        supp[p] += 1
    n_baskets = len(baskets)
    pair: dict[tuple[int, int], int] = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    rules = []
    for (u, v), c in pair.items():
        if c < 2:
            continue
        for a, b in ((u, v), (v, u)):
            conf = c * 1000000 // supp[a]
            lift = c * n_baskets * 1000000 // (supp[a] * supp[b])
            rules.append((a, b, c, supp[a], supp[b], conf, lift))
    rules.sort(key=lambda r: (-r[6], -r[5], r[0], r[1]))
    return rules[:20]


@pytest.fixture(scope="module")
def ar_rows(spark, sf_dir):
    return REGISTRY["assoc_rules_top20"].build(spark, sf_dir).collect()


def test_assoc_rules_match_python(ar_rows, sf_dir):
    got = [
        (r.ante, r.cons, r.supp_ab, r.supp_a, r.supp_b, r.conf_ppm, r.lift_ppm)
        for r in ar_rows
    ]
    assert got == _py_assoc(sf_dir)


def test_assoc_rules_laws(ar_rows):
    """Confidence is a probability (<= 1e6 ppm); pair support never
    exceeds either item support; every rule meets the support floor."""
    assert len(ar_rows) > 0
    for r in ar_rows:
        assert r.supp_ab >= 2
        assert r.supp_ab <= min(r.supp_a, r.supp_b)
        assert 0 < r.conf_ppm <= 1000000
        assert r.lift_ppm > 0


# ---------------------------------------------------------------------------
# markov_attribution


def _py_markov(sf_dir: str) -> list[tuple]:
    """Journey building, ppb transition matrix, 8-step absorption and
    removal effects replicated with Python ints (same truncating
    division order as the shared SQL)."""
    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    edges: dict[tuple[str, str], int] = defaultdict(int)
    prev_user = prev_type = None
    for user, et in rows:
        if user != prev_user:
            if prev_user is not None and prev_type != "purchase":
                edges[(prev_type, "null")] += 1
            src = "start"
        else:
            src = "start" if prev_type == "purchase" else prev_type
        edges[(src, "conv" if et == "purchase" else et)] += 1
        prev_user, prev_type = user, et
    if prev_user is not None and prev_type != "purchase":
        edges[(prev_type, "null")] += 1

    out_n: dict[str, int] = defaultdict(int)
    for (s, _), c in edges.items():
        out_n[s] += c
    p = {(s, d): c * 10**9 // out_n[s] for (s, d), c in edges.items()}
    channels = sorted({d for (_, d) in edges if d not in ("conv", "null")})
    states = ["start"] + channels

    def absorb(removed: str | None) -> int:
        a = {
            s: p.get((s, "conv"), 0) for s in states if s != removed
        }
        for _ in range(7):  # a1 = pconv, then 7 more rounds -> H=8
            a = {
                s: p.get((s, "conv"), 0)
                + sum(
                    p[(s, d)] * a[d] // 10**9
                    for d in channels
                    if d != removed and (s, d) in p
                )
                for s in states
                if s != removed
            }
        return a["start"]

    base = absorb(None)
    effs = [(c, base - absorb(c)) for c in channels]
    tot = sum(e for _, e in effs)
    return [
        (
            c,
            base,
            base - e,
            e,
            e * 10**6 // tot if tot else None,
        )
        for c, e in effs
    ]


@pytest.fixture(scope="module")
def mk_rows(spark, sf_dir):
    return REGISTRY["markov_attribution"].build(spark, sf_dir).collect()


def test_markov_matches_python(mk_rows, sf_dir):
    got = [
        (r.channel, r.base_ppb, r.removed_conv_ppb, r.effect_ppb, r.share_ppm)
        for r in mk_rows
    ]
    assert got == _py_markov(sf_dir)


def test_markov_laws(mk_rows):
    """Removal never raises the absorption probability (every term of
    the bounded-horizon recursion is non-negative and the removed
    matrix is entrywise <=); probabilities are valid ppb; shares are a
    partition of ~10^6 (truncating division loses < |channels| ppm)."""
    assert len(mk_rows) > 0
    for r in mk_rows:
        assert 0 <= r.removed_conv_ppb <= r.base_ppb <= 10**9
        assert r.effect_ppb == r.base_ppb - r.removed_conv_ppb
        assert r.effect_ppb >= 0
    tot = sum(r.share_ppm for r in mk_rows)
    assert 10**6 - len(mk_rows) <= tot <= 10**6


def test_assoc_rules_apriori_prune_lossless(spark, tmp_path):
    """Support-monotonicity law: the broadcast anti-join prune of
    below-floor parts cannot change the output. The TPC-H layouts have
    ZERO singleton parts (the prune is a no-op there), so this corpus
    plants singleton-heavy baskets — 40 parts appearing in exactly one
    basket each — alongside genuine >=2-support pairs, and compares the
    pruned pipeline against the unpruned pure-Python replication."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_o, rows_p = [], []
    # 5 baskets sharing parts {1,2,3} pairwise (supp >= 2 pairs),
    # each basket also carrying 8 singleton parts (supp == 1).
    sid = 1000
    for o in range(5):
        parts = [1, 2, 3] if o % 2 == 0 else [1, 2]
        for _ in range(8):
            parts.append(sid)
            sid += 1
        for p in parts:
            rows_o.append(o)
            rows_p.append(p)
    d = tmp_path / "ar_corpus"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    got = [
        (r.ante, r.cons, r.supp_ab, r.supp_a, r.supp_b, r.conf_ppm,
         r.lift_ppm)
        for r in REGISTRY["assoc_rules_top20"].build(spark, str(d))
        .collect()
    ]
    assert got == _py_assoc(str(d))
    # the prune actually bit: singleton parts appear in no rule
    assert got and all(r[0] < 1000 and r[1] < 1000 for r in got)


def test_markov_sentinel_collision_raises(spark, tmp_path):
    """A real event_type equal to a synthetic state name must raise
    loudly (both engines), not silently merge states."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "mk_corpus"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "user_id": pa.array([7, 7], pa.int64()),
                "ts": pa.array(
                    [1000000, 2000000], pa.timestamp("us")
                ),
                "event_type": pa.array(["click", "start"], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    with pytest.raises(Exception, match="sentinel"):
        REGISTRY["markov_attribution"].build(spark, str(d)).collect()
