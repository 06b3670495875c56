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


# ---------------------------------------------------------------------------
# Decision stump (information gain)


def test_decision_stump_matches_pure_python(spark):
    [r] = _rows(spark, "decision_stump_quantity_split")
    cells = duckdb.sql(
        f"""
        SELECT CAST(l_quantity AS BIGINT) AS q, l_returnflag AS f,
               COUNT(*) AS c
        FROM '{SF}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    qs = sorted({int(q) for q, _, _ in cells})

    def qterm(c, n):
        return math.floor((c * math.log(n) - c * math.log(c)) * 1000.0 + 0.5)

    best = None
    for s in qs[:-1]:
        sides = {"L": Counter(), "R": Counter()}
        for q, f, c in cells:
            sides["L" if q <= s else "R"][f] += int(c)
        score = sum(
            qterm(c, sum(side.values()))
            for side in sides.values()
            for c in side.values()
        )
        nl = sum(sides["L"].values())
        nr = sum(sides["R"].values())
        cand = (score, s, nl, nr)
        if best is None or cand[:2] < best[:2]:
            best = cand
    parent = Counter()
    for q, f, c in cells:
        parent[f] += int(c)
    n = sum(parent.values())
    p_milli = sum(qterm(c, n) for c in parent.values())
    assert (
        r.split_q,
        r.n_left,
        r.n_right,
        r.child_entropy_milli,
        r.info_gain_milli,
    ) == (best[1], best[2], best[3], best[0], p_milli - best[0])
    assert r.n_left + r.n_right == n
    assert r.info_gain_milli >= 0  # splitting cannot lose information


# ---------------------------------------------------------------------------
# Event trigram patterns


def test_trigrams_match_pure_python(spark):
    got = [(r.t1, r.t2, r.t3, r.n) for r in _rows(spark, "event_trigram_patterns")]
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM"
        f" '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    byuser = defaultdict(list)
    for u, ts, eid, et in ev:
        byuser[u].append(et)
    cnt = Counter()
    for seq in byuser.values():
        for i in range(len(seq) - 2):
            cnt[(seq[i], seq[i + 1], seq[i + 2])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [(t1, t2, t3, n) for (t1, t2, t3), n in want]


# ---------------------------------------------------------------------------
# FIFO return matching


def _py_fifo():
    """Direct sequential FIFO allocation loop — the queue semantics the
    interval-intersection formulation must equal exactly."""
    rows = duckdb.sql(
        f"""
        SELECT l_partkey, l_returnflag, CAST(l_quantity AS BIGINT),
               l_shipdate
        FROM '{SF}/lineitem.parquet' WHERE l_returnflag IN ('N', 'R')
        ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber
        """
    ).fetchall()
    supply = defaultdict(list)
    demand = defaultdict(list)
    for pk, flag, q, d in rows:
        (supply if flag == "N" else demand)[pk].append([int(q), d])
    out = {}
    for pk, dem in demand.items():
        sup = [list(s) for s in supply.get(pk, [])]
        si = 0
        matched = wage = 0
        dtot = sum(q for q, _ in dem)
        for dq, ddate in dem:
            while dq > 0 and si < len(sup):
                take = min(dq, sup[si][0])
                if take > 0:
                    matched += take
                    wage += take * (ddate - sup[si][1]).days
                    sup[si][0] -= take
                    dq -= take
                if sup[si][0] == 0:
                    si += 1
        out[pk] = (matched, dtot - matched, wage)
    return out


def test_fifo_interval_form_equals_sequential_loop(spark):
    got = _rows(spark, "fifo_return_matching")
    want = _py_fifo()
    assert len(got) == 20
    for r in got:
        m, u, w = want[r.partkey]
        assert (r.matched_qty, r.unmatched_qty, r.qty_age_days) == (m, u, w)
    # The top-20 selection itself must match the loop's ordering.
    top = sorted(
        ((m, -pk) for pk, (m, _, _) in want.items()), reverse=True
    )[:20]
    assert [(r.matched_qty, -r.partkey) for r in got] == top


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard


def test_nelson_aalen_matches_pure_python(spark):
    rows = _rows(spark, "nelson_aalen_hazard")
    d = duckdb.sql(
        f"""
        WITH h AS (SELECT MAX(ts) AS horizon
                   FROM '{SF}/events.parquet'),
        s AS (SELECT user_id, MIN(ts) AS s_ts FROM '{SF}/events.parquet'
              WHERE event_type = 'signup' GROUP BY user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
              FROM '{SF}/events.parquet' e
              JOIN s ON e.user_id = s.user_id AND e.ts >= s.s_ts
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END,
               (epoch_us(COALESCE(p.p_ts, h.horizon)) - epoch_us(s.s_ts))
                 // 86400000000
        FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN h
        """
    ).fetchall()
    byd = defaultdict(lambda: [0, 0])
    for evt, dur in d:
        byd[int(dur)][0 if evt else 1] += 1
    at_risk = len(d)
    cum = 0
    want = []
    for dur in sorted(byd):
        d_t, c_t = byd[dur]
        cum += d_t * 1_000_000_000 // at_risk
        want.append((dur, at_risk, d_t, c_t, cum))
        at_risk -= d_t + c_t
    assert [
        (r.duration_day, r.n_risk, r.n_events, r.n_censored, r.cumhaz_q)
        for r in rows
    ] == want
    hz = [r.cumhaz_q for r in rows]
    assert hz == sorted(hz)  # cumulative hazard is nondecreasing


# ---------------------------------------------------------------------------
# Segmented trend at the changepoint


def test_segmented_trend_matches_python_and_detector(spark):
    rows = {r.segment: r for r in _rows(spark, "segmented_trend_changepoint")}
    assert set(rows) == {"pre", "post"}
    daily = duckdb.sql(
        f"""
        SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS x,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM '{SF}/orders.parquet' GROUP BY o_orderdate ORDER BY x
        """
    ).fetchall()
    xs = [int(x) for x, _ in daily]
    rs = [int(r) for _, r in daily]
    n, total = len(rs), sum(rs)
    cum, best = 0, None
    for x, r in zip(xs, rs):
        cum += r * n - total
        if best is None or abs(cum) > best[0]:
            best = (abs(cum), x)
    cp_x = best[1]
    import datetime as dt

    cp_day = (dt.date(1992, 1, 1) + dt.timedelta(days=cp_x)).isoformat()
    assert rows["pre"].cp_day == cp_day and rows["post"].cp_day == cp_day
    # The detector must agree with revenue_changepoint bit-for-bit.
    [cpq] = _rows(spark, "revenue_changepoint")
    assert cpq.cp_day == cp_day
    pre = [(x, r) for x, r in zip(xs, rs) if x <= cp_x]
    post = [(x, r) for x, r in zip(xs, rs) if x > cp_x]
    assert rows["pre"].n_days == len(pre)
    assert rows["post"].n_days == len(post)
    for seg, pts in (("pre", pre), ("post", post)):
        sl, _ = np.polyfit(
            np.asarray([p[0] for p in pts], float),
            np.asarray([p[1] for p in pts], float),
            1,
        )
        assert math.isclose(
            rows[seg].slope_cents_per_day, float(sl), rel_tol=1e-6
        )


# ---------------------------------------------------------------------------
# Wasserstein-1 distance


def test_wasserstein_matches_two_pointer_python(spark):
    [r] = _rows(spark, "wasserstein_daily_revenue")
    daily = duckdb.sql(
        f"""
        SELECT year(o_orderdate) AS y,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM '{SF}/orders.parquet'
        WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY o_orderdate
        """
    ).fetchall()
    a = sorted(int(v) for y, v in daily if y == 1995)
    b = sorted(int(v) for y, v in daily if y == 1996)
    n1, n2 = len(a), len(b)
    # Independent formulation: integral of |F1 - F2| over the merged
    # support, walked with two pointers (not the SQL's window shape).
    support = sorted(set(a) | set(b))
    num = 0
    i = j = 0
    for k, v in enumerate(support[:-1]):
        while i < n1 and a[i] <= v:
            i += 1
        while j < n2 and b[j] <= v:
            j += 1
        num += abs(i * n2 - j * n1) * (support[k + 1] - v)
    assert (r.n1_days, r.n2_days, r.w1_num) == (n1, n2, num)
    assert math.isclose(
        r.w1_dollars, num / (n1 * n2) / 100.0, rel_tol=1e-12
    )
    # W1 lower bound: at least the mean shift.
    mean_gap = abs(sum(a) / n1 - sum(b) / n2) / 100.0
    assert r.w1_dollars >= mean_gap - 1e-9


# ---------------------------------------------------------------------------
# Gini coefficient


def test_gini_matches_sorted_rank_formula(spark):
    [r] = _rows(spark, "gini_customer_revenue")
    vals = sorted(
        int(v)
        for (v,) in duckdb.sql(
            f"""
            SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM '{SF}/orders.parquet' GROUP BY o_custkey
            """
        ).fetchall()
    )
    n, s = len(vals), sum(vals)
    two_sum = 2 * sum((i + 1) * v for i, v in enumerate(vals))
    assert (r.n_customers, r.total_cents, r.two_sum_rank_value) == (
        n,
        s,
        str(two_sum),
    )
    gini = (two_sum - (n + 1) * s) / (n * s)
    assert math.isclose(r.gini, gini, rel_tol=1e-12)
    assert 0.0 <= r.gini < 1.0


# ---------------------------------------------------------------------------
# Consistent-hash resharding


def _py_ring(n, v=16):
    ring = []
    for s in range(n):
        for j in range(v):
            ring.append(
                (int(hashlib.md5(f"s{s}-v{j}".encode()).hexdigest()[:12], 16), s)
            )
    ring.sort()
    return ring


def _py_assign(ring, h):
    for pos, s in ring:
        if pos >= h:
            return s
    return ring[0][1]


def test_resharding_matches_python_and_moves_only_to_new_shard(spark):
    got = [
        (r.shard, r.n_docs, r.n_moved_out, r.moved_ppm)
        for r in _rows(spark, "consistent_hash_resharding")
    ]
    r8, r9 = _py_ring(8), _py_ring(9)
    ids = [
        int(i)
        for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    agg = defaultdict(lambda: [0, 0])
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        s8, s9 = _py_assign(r8, h), _py_assign(r9, h)
        agg[s8][0] += 1
        if s8 != s9:
            agg[s8][1] += 1
            # consistent hashing's defining property: adding shard 8
            # only moves keys INTO shard 8, never between old shards
            assert s9 == 8, (i, s8, s9)
    want = [
        (s, n, m, m * 1_000_000 // n) for s, (n, m) in sorted(agg.items())
    ]
    assert got == want
    total = sum(n for _, n, _, _ in got)
    moved = sum(m for _, _, m, _ in got)
    assert total == len(ids)
    # movement stays near the 1/(N+1) ideal, far below modulo-hash ~8/9
    assert moved / total < 0.45


# ---------------------------------------------------------------------------
# Greedy max-coverage source selection


def test_greedy_coverage_matches_python_sets(spark):
    # sf0.01: sf0.001's 50-doc corpus is covered by ONE source (both
    # engines stop after round 1); the larger corpus exercises a real
    # multi-round greedy loop.
    sf = "/root/testdata/sf0.01"
    got = [
        (r.round, r.source, r.marginal_gain, r.covered)
        for r in _rows(spark, "greedy_source_coverage", sf)
    ]
    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    toks = defaultdict(set)
    for src, text in docs:
        toks[src] |= set(text.strip().lower().split())
    covered = set()
    want = []
    for rnd in range(1, 6):
        # deterministic tiebreak: gain desc, source asc; an all-covered
        # state ends the loop in both engines (empty GROUP BY / empty
        # anti-join)
        gains = {s: len(toks[s] - covered) for s in toks}
        best = sorted(gains, key=lambda s: (-gains[s], s))[0]
        if gains[best] == 0:
            break
        covered |= toks[best]
        want.append((rnd, best, gains[best], len(covered)))
    assert got == want
    # greedy marginal gains are non-increasing (submodularity)
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)
    # covered is the running sum of gains (picks are disjoint additions)
    run = 0
    for _, _, g, c in got:
        run += g
        assert c == run


# ---------------------------------------------------------------------------
# Stratified-matching ATT


def test_stratified_att_matches_pure_python(spark):
    [r] = _rows(spark, "stratified_att_matching")
    rows = duckdb.sql(
        f"""
        SELECT user_id % 2,
               SUM(CASE WHEN day(ts) <= 15
                   THEN CAST(round(value * 100) AS BIGINT) // 1000
                   ELSE 0 END),
               SUM(CASE WHEN day(ts) > 15
                   THEN CAST(round(value * 100) AS BIGINT) // 1000
                   ELSE 0 END)
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # s -> nt, nc, syt, syc
    for t, x, y in rows:
        s = int(math.floor(math.log2(int(x) + 1)))
        c = cells[s]
        if t == 1:
            c[0] += 1
            c[2] += int(y)
        else:
            c[1] += 1
            c[3] += int(y)
    num = den = unmatched = n_strata = 0
    tot_nt = tot_nc = tot_syt = tot_syc = 0
    for s, (nt, nc, syt, syc) in cells.items():
        tot_nt += nt
        tot_nc += nc
        tot_syt += syt
        tot_syc += syc
        if nt > 0 and nc > 0:
            # truncating division, matching Spark div / DuckDB //
            num += syt * 1000 - _trunc_div(nt * syc * 1000, nc)
            den += nt
            n_strata += 1
        elif nt > 0:
            unmatched += nt
    assert (
        r.n_treated_matched,
        r.n_treated_unmatched,
        r.n_strata_matched,
        r.att_milli,
        r.naive_diff_milli,
    ) == (
        den,
        unmatched,
        n_strata,
        _trunc_div(num, den),
        _trunc_div(tot_syt * 1000, tot_nt)
        - _trunc_div(tot_syc * 1000, tot_nc),
    )
    # every treated user is accounted for: matched + off-support
    assert den + unmatched == tot_nt


# ---------------------------------------------------------------------------
# Mann-Whitney U


def test_mann_whitney_matches_pure_python(spark):
    [r] = _rows(spark, "mann_whitney_order_values")
    rows = duckdb.sql(
        f"""
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000,
               o_orderkey % 2
        FROM '{SF}/orders.parquet'
        """
    ).fetchall()
    vals = sorted((int(v), int(t)) for v, t in rows)
    n = len(vals)
    # midranks via tie groups over the sorted pooled sample
    r2a = 0  # doubled rank sum of group A (t=1)
    tie3 = 0
    i = 0
    na = sum(1 for _, t in vals if t == 1)
    nb = n - na
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        c = j - i
        dbl_midrank = 2 * i + c + 1  # = 2 * average of ranks i+1..j
        r2a += dbl_midrank * sum(1 for k in range(i, j) if vals[k][1] == 1)
        tie3 += c * c * c - c
        i = j
    u2a = r2a - na * (na + 1)
    assert (r.n_a, r.n_b, r.u_a_doubled) == (na, nb, u2a)
    u = u2a / 2.0
    z = (u - na * nb / 2.0) / math.sqrt(
        na * nb / 12.0 * ((na + nb + 1.0) - tie3 / ((na + nb) * (na + nb - 1.0)))
    )
    assert math.isclose(r.z_score, z, rel_tol=1e-12)
    # U_a + U_b = n_a * n_b (doubled: identity over the rank partition)
    vals_b = [(v, 1 - t) for v, t in vals]
    r2b = 0
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        c = j - i
        r2b += (2 * i + c + 1) * sum(
            1 for k in range(i, j) if vals[k][1] == 0
        )
        i = j
    u2b = r2b - nb * (nb + 1)
    assert u2a + u2b == 2 * na * nb


# ---------------------------------------------------------------------------
# FIFO formulation property: interval algebra == sequential loop,
# on ARBITRARY inventories (no Spark in the loop — the formulation is
# validated through DuckDB, which the Spark plan already hash-matches)

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),            # part
            st.sampled_from("NR"),        # supply / demand
            st.integers(1, 9),            # quantity
            st.integers(0, 20),           # ship-day offset
        ),
        min_size=1,
        max_size=24,
    )
)
def test_fifo_interval_algebra_equals_loop_on_random_inventories(rows):
    import datetime as dt

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE li (l_partkey BIGINT, l_returnflag VARCHAR,"
        " l_quantity BIGINT, l_shipdate DATE, l_orderkey BIGINT,"
        " l_linenumber BIGINT)"
    )
    base = dt.date(1995, 1, 1)
    for i, (pk, flag, q, d) in enumerate(rows):
        con.execute(
            "INSERT INTO li VALUES (?, ?, ?, ?, ?, ?)",
            [pk, flag, q, base + dt.timedelta(days=d), i, 1],
        )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            """
            WITH supply AS (
              SELECT l_partkey,
                     SUM(l_quantity) OVER w AS shi,
                     SUM(l_quantity) OVER w - l_quantity AS slo,
                     l_shipdate AS sdate
              FROM li WHERE l_returnflag = 'N'
              WINDOW w AS (PARTITION BY l_partkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            ),
            demand AS (
              SELECT l_partkey,
                     SUM(l_quantity) OVER w AS dhi,
                     SUM(l_quantity) OVER w - l_quantity AS dlo,
                     SUM(l_quantity) OVER (PARTITION BY l_partkey) AS dq,
                     l_shipdate AS ddate
              FROM li WHERE l_returnflag = 'R'
              WINDOW w AS (PARTITION BY l_partkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            ),
            matched AS (
              SELECT d.l_partkey, d.dq,
                     LEAST(s.shi, d.dhi) - GREATEST(s.slo, d.dlo) AS mq,
                     date_diff('day', s.sdate, d.ddate) AS age
              FROM demand d JOIN supply s
                ON d.l_partkey = s.l_partkey
               AND s.slo < d.dhi AND d.dlo < s.shi
            )
            SELECT l_partkey, CAST(SUM(mq) AS BIGINT),
                   CAST(MAX(dq) - SUM(mq) AS BIGINT),
                   CAST(SUM(mq * age) AS BIGINT)
            FROM matched GROUP BY l_partkey
            """
        ).fetchall()
    }
    # sequential FIFO loop, same total order
    ordered = sorted(
        ((pk, flag, q, d, i) for i, (pk, flag, q, d) in enumerate(rows)),
        key=lambda r: (r[0], r[3], r[4]),
    )
    supply = defaultdict(list)
    demand = defaultdict(list)
    for pk, flag, q, d, _ in ordered:
        (supply if flag == "N" else demand)[pk].append([q, d])
    for pk, dem in demand.items():
        sup = [list(x) for x in supply.get(pk, [])]
        si = matched = wage = 0
        dtot = sum(q for q, _ in dem)
        for dq_, dd in dem:
            while dq_ > 0 and si < len(sup):
                take = min(dq_, sup[si][0])
                matched += take
                wage += take * (dd - sup[si][1])
                sup[si][0] -= take
                dq_ -= take
                if sup[si][0] == 0:
                    si += 1
        if matched > 0:
            assert got[pk] == (matched, dtot - matched, wage), (pk, rows)
        else:
            assert pk not in got
    for pk in got:
        assert pk in demand
