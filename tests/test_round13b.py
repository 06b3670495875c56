"""Round-13 continuation tests: independent replications (pure
Python/numpy, no DuckDB) of the five new statistics queries, plus the
structural invariants each family owes — the same two-witness pattern
(oracle + replication) the round-12 GLM stack established."""

import hashlib
import math

import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].build(spark, SF).collect()


@pytest.fixture(scope="module")
def events_pd(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "value", "ts")
        .toPandas()
    )


def test_ks_matches_pure_python(spark, events_pd):
    df = events_pd[events_pd.event_type.isin(["purchase", "click"])]
    v_c = (df.value * 100 + 0.5).astype("int64")
    p = sorted(v_c[df.event_type == "purchase"])
    c = sorted(v_c[df.event_type == "click"])
    n1, n2 = len(p), len(c)
    best, at = -1, None
    for v in sorted(set(p) | set(c)):
        f1 = sum(1 for x in p if x <= v)
        f2 = sum(1 for x in c if x <= v)
        dn = abs(n2 * f1 - n1 * f2)
        if dn > best:
            best, at = dn, v
    (row,) = _rows(spark, "ks_two_sample_value")
    assert (row.n_purchase, row.n_click) == (n1, n2)
    assert row.d_num == best
    assert row.at_value_c == at
    assert row.d_q == int(best * 1_000_000.0 / (float(n1) * float(n2)) + 0.5)


def test_brier_decomposition_identity_and_replication(spark):
    import pandas as pd  # noqa: F401

    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_orderstatus")
        .toPandas()
    )
    Q = 10_000
    orders["y"] = (orders.o_orderstatus == "F").astype(int)
    orders["yr"] = orders.o_orderdate.map(lambda d: d.year)
    orders["split"] = orders.o_orderkey.map(
        lambda k: 0
        if hashlib.md5(str(k).encode()).hexdigest()[:2] < "80"
        else 1
    )
    tr = orders[orders.split == 0].groupby(["o_orderpriority", "yr"])["y"]
    p_q = {k: (int(g.sum()) * Q) // int(g.count()) for k, g in tr}
    ev = orders[orders.split == 1]
    ev = ev[[k in p_q for k in zip(ev.o_orderpriority, ev.yr)]]
    bins = {}
    for pri, yr, y in zip(ev.o_orderpriority, ev.yr, ev.y):
        n, o = bins.get((pri, yr), (0, 0))
        bins[(pri, yr)] = (n + 1, o + int(y))
    n_ev = sum(n for n, _ in bins.values())
    o_ev = sum(o for _, o in bins.values())
    b_num = sum(
        n * p_q[k] * p_q[k] - 2 * p_q[k] * o * Q + o * Q * Q
        for k, (n, o) in bins.items()
    )
    rel = sum(
        math.floor(
            n * (p_q[k] / Q - o / n) * (p_q[k] / Q - o / n) * 1e6 + 0.5
        )
        for k, (n, o) in bins.items()
    )
    res = sum(
        math.floor(
            n * (o / n - o_ev / n_ev) * (o / n - o_ev / n_ev) * 1e6 + 0.5
        )
        for k, (n, o) in bins.items()
    )
    (row,) = _rows(spark, "brier_decomposition")
    assert row.n_eval == n_ev and row.n_bins == len(bins)
    assert row.brier_q == math.floor(b_num * 1e6 / (Q * Q * n_ev) + 0.5)
    assert (row.rel_num_q, row.res_num_q) == (rel, res)
    # Murphy identity: brier = rel/N - res/N + unc, up to the per-bin
    # quantization (each of ~n_bins terms floors once at 1e-6).
    lhs = row.brier_q / 1e6
    rhs = (row.rel_num_q - row.res_num_q) / 1e6 / n_ev + row.unc_q / 1e6
    assert abs(lhs - rhs) <= (row.n_bins + 2) / 1e6 * max(1, 1e6 / n_ev) + 1e-4


def test_zipf_slope_matches_numpy(spark):
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    counts: dict = {}
    for t in docs.text:
        if not t or not t.strip():
            continue
        for w in t.strip().lower().split():
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.array(
        [math.floor(math.log(r + 1) * 1e6 + 0.5) for r in range(len(top))],
        dtype=np.int64,
    )
    y = np.array(
        [math.floor(math.log(c) * 1e6 + 0.5) for _, c in top],
        dtype=np.int64,
    )
    n = len(top)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (row,) = _rows(spark, "zipf_slope_tokens")
    assert row.n_ranked == n
    # libm ln differences between JVM/Python stay inside a few ulps —
    # allow 2 quanta on the quantized slope.
    assert abs(row.slope_q - math.floor(slope * 1e6 + 0.5)) <= 2
    assert row.slope_q < 0  # Zipf: frequency falls with rank
    assert 0 <= row.r2_q <= 1_000_000


def test_jl_projection_probe_and_recall(spark):
    rows = _rows(spark, "jl_projection_top10")
    assert len(rows) == 10
    assert [r.rank for r in rows] == list(range(1, 11))
    first = rows[0]
    # the probe matches itself exactly in both spaces
    assert (first.vec_id, first.pdist, first.qdist) == (0, 0, 0)
    assert first.in_exact_top10 is True
    # projected distances are sorted by construction
    pd_ = [r.pdist for r in rows]
    assert pd_ == sorted(pd_)


def test_jl_projection_distances_match_numpy(spark):
    import numpy as np

    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        qlsh_signs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    E = np.stack(emb.embedding.to_numpy()).astype(np.float64) * 127.0
    Q = (np.sign(E) * np.floor(np.abs(E) + 0.5)).astype(np.int64)
    S = np.array(qlsh_signs(16, 64, salt="jl:"), dtype=np.int64).T
    Y = Q @ S
    ids = emb.vec_id.to_numpy()
    i0 = int(np.where(ids == 0)[0][0])
    pdist = ((Y - Y[i0]) ** 2).sum(axis=1)
    qdist = ((Q - Q[i0]) ** 2).sum(axis=1)
    by_id = {int(v): (int(p), int(q)) for v, p, q in zip(ids, pdist, qdist)}
    for r in _rows(spark, "jl_projection_top10"):
        assert by_id[r.vec_id] == (r.pdist, r.qdist)


def test_sprt_matches_pure_python(spark, events_pd):
    df = events_pd[events_pd.event_type.isin(["purchase", "click"])]
    la = math.floor(math.log(0.52 / 0.48) * 1e9 + 0.5)
    lb = math.floor(math.log(0.48 / 0.52) * 1e9 + 0.5)
    a_q = math.floor(math.log(0.95 / 0.05) * 1e9 + 0.5)
    b_q = math.floor(math.log(0.05 / 0.95) * 1e9 + 0.5)
    daily: dict = {}
    for uid, et, ts in zip(df.user_id, df.event_type, df.ts):
        variant = (
            "A"
            if int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
            == 0
            else "B"
        )
        k = (variant, ts.date())
        n, x = daily.get(k, (0, 0))
        daily[k] = (n + 1, x + (1 if et == "purchase" else 0))
    expected = {}
    for variant in ("A", "B"):
        days = sorted(d for v, d in daily if v == variant)
        cum, up, dn, final = 0, None, None, 0
        for d in days:
            n, x = daily[(variant, d)]
            cum += x * la + (n - x) * lb
            if up is None and cum >= a_q:
                up = d
            if dn is None and cum <= b_q:
                dn = d
            final = cum
        if up is not None and (dn is None or up <= dn):
            decision, dday = "accept_h1", up
        elif dn is not None:
            decision, dday = "accept_h0", dn
        else:
            decision, dday = "continue", None
        expected[variant] = (
            len(days),
            decision,
            dday.isoformat() if dday else None,
            final,
        )
    for r in _rows(spark, "sprt_ab_decision"):
        assert expected[r.variant] == (
            r.n_days,
            r.decision,
            r.decision_day,
            r.final_llr_q,
        ), r.variant


def test_events_horizon_footer_equals_scan(spark):
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import (
        events_horizon_us,
        load_table,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hz = events_horizon_us(sf)
        if hz is None:  # footer stats absent: fallback path covers it
            continue
        from pyspark.sql import functions as F

        scan = load_table(spark, sf, "events").agg(F.max("ts")).first()[0]
        assert hz == scan, (sf, hz, scan)


def test_survival_family_scan_counts(spark, sf_dir):
    """The shared duration relation must keep the survival family at
    TWO fact scans total: the signup leg materializes once at build
    (eager checkpoint — so the served plan scans parquet exactly ONCE,
    the purchase leg), the footer-statistics horizon replaced the old
    third scan, and KM's `total` re-run of the whole pipeline is gone."""
    import re

    from tests.test_plans import fresh_plan

    def scan_count(plan: str) -> int:
        return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))

    import pyarrow.parquet as pq

    # On a TIMESTAMP(NANOS)-physical corpus generation the footer
    # horizon is deliberately unavailable and the fallback adds one
    # aggregate scan. Derive the expected mode from the FILE's actual
    # physical type, not from events_horizon_us itself — on the naive
    # micros corpus this PINS that the footer path is live (a
    # regression to the fallback fails the == 1 assertion).
    t = str(
        pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow.field(
            "ts"
        ).type
    )
    want = 1 if t == "timestamp[us]" else 2
    for name in (
        "kaplan_meier_conversion",
        "nelson_aalen_hazard",
        "cox_hazard_newton",
    ):
        p = fresh_plan(spark, sf_dir, name)
        assert scan_count(p) == want, (name, p)


def test_ams_f2_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    counts: dict = {}
    for t in docs.text:
        if not t or not t.strip():
            continue
        for w in t.strip().lower().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    K = 16
    z = [0] * K
    for tok, c in counts.items():
        for i in range(K):
            s = (
                1
                if int(
                    hashlib.md5(f"f2:{i},{tok}".encode()).hexdigest()[0], 16
                )
                % 2
                == 1
                else -1
            )
            z[i] += c * s
    exact = sum(c * c for c in counts.values())
    est = sum(v * v for v in z) // K
    (row,) = _rows(spark, "ams_f2_tokens")
    assert row.n_tokens_distinct == len(counts)
    assert row.exact_f2 == exact
    assert row.est_f2 == est
    assert row.err_ppm == abs(est - exact) * 1_000_000 // exact


def test_woe_iv_replication_and_nonnegative_iv(spark):
    rows = _rows(spark, "woe_iv_segments")
    assert len(rows) >= 5  # segments x balance signs present in corpus
    cust = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    f_cust = set(orders[orders.o_orderstatus == "F"].o_custkey)
    bins: dict = {}
    for ck, seg, bal in zip(cust.c_custkey, cust.c_mktsegment, cust.c_acctbal):
        k = (seg, "pos" if bal >= 0 else "neg")
        g, b = bins.get(k, (0, 0))
        if ck in f_cust:
            bins[k] = (g + 1, b)
        else:
            bins[k] = (g, b + 1)
    gt = sum(g for g, _ in bins.values())
    bt = sum(b for _, b in bins.values())
    nb = len(bins)
    for r in rows:
        g, b = bins[(r.seg, r.bal)]
        assert (r.n_good, r.n_bad) == (g, b), (r.seg, r.bal)
        gs = (g + 1.0) / (gt + float(nb))
        bs = (b + 1.0) / (bt + float(nb))
        assert r.woe_q == math.floor(math.log(gs / bs) * 1e6 + 0.5)
        assert r.iv_term_q == math.floor(
            (gs - bs) * math.log(gs / bs) * 1e9 + 0.5
        )
        # (a-b) and ln(a/b) share a sign, so every IV term is >= 0
        assert r.iv_term_q >= 0


def test_cdc_chunk_stats_matches_pure_python(spark):
    W, MOD, MIX, MASK = 16, 64, 2654435761, 1 << 20
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    per_source: dict = {}
    for doc_id, src, t in zip(docs.doc_id, docs.source, docs.text):
        if not t or not t.strip():
            continue
        n = len(t)
        gear = [(ord(c) * MIX) % MASK for c in t]
        ends = [
            i
            for i in range(W, n)  # 1-based boundary i in [W, n)
            if sum(gear[i - 1 - k] * (1 << k) for k in range(W)) % MOD == 0
        ]
        starts = [1] + [e + 1 for e in ends]
        stops = ends + [n]
        rec = per_source.setdefault(src, {"docs": set(), "lens": [], "hs": []})
        rec["docs"].add(doc_id)
        for s, e in zip(starts, stops):
            rec["lens"].append(e - s + 1)
            rec["hs"].append(
                hashlib.md5(t[s - 1 : e].encode()).hexdigest()
            )
    rows = _rows(spark, "cdc_chunk_stats")
    assert {r.source for r in rows} == set(per_source)
    for r in rows:
        rec = per_source[r.source]
        assert r.n_docs == len(rec["docs"])
        assert r.n_chunks == len(rec["lens"])
        assert r.chars_total == sum(rec["lens"])
        assert r.avg_len_c == sum(rec["lens"]) * 100 // len(rec["lens"])
        assert r.n_distinct_chunks == len(set(rec["hs"]))
        assert r.dup_chunks == len(rec["hs"]) - len(set(rec["hs"]))


def test_cdc_position_shift_invariance(spark):
    """The CDC property fixed-size chunking lacks: a shared substring
    far from both documents' starts must produce identical interior
    chunk hashes regardless of the (different-length) prefixes."""
    import hashlib as hl

    W, MOD, MIX, MASK = 16, 64, 2654435761, 1 << 20

    def chunks(t):
        n = len(t)
        gear = [(ord(c) * MIX) % MASK for c in t]
        ends = [
            i
            for i in range(W, n)
            if sum(gear[i - 1 - k] * (1 << k) for k in range(W)) % MOD == 0
        ]
        starts = [1] + [e + 1 for e in ends]
        stops = ends + [n]
        return [
            hl.md5(t[s - 1 : e].encode()).hexdigest()
            for s, e in zip(starts, stops)
        ]

    import random

    rng = random.Random(7)
    shared = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    a = "PREFIX-A " + shared
    b = "a different and much longer prefix here " + shared
    ca, cb = set(chunks(a)), set(chunks(b))
    # all interior chunks of the shared region coincide
    assert len(ca & cb) >= max(1, len(ca) - 3)


def test_token_count_served_twins_match_from_scratch(spark):
    for served, original in (
        ("zipf_slope_tokens_served", "zipf_slope_tokens"),
        ("ams_f2_tokens_served", "ams_f2_tokens"),
    ):
        sdf = REGISTRY[served].build(spark, SF)
        odf = REGISTRY[original].build(spark, SF)
        assert sdf.columns == odf.columns, served
        assert sorted(map(tuple, sdf.collect())) == sorted(
            map(tuple, odf.collect())
        ), served


def test_survival_served_twins_match_from_scratch(spark):
    for served, original in (
        ("kaplan_meier_conversion_served", "kaplan_meier_conversion"),
        ("nelson_aalen_hazard_served", "nelson_aalen_hazard"),
        ("cox_hazard_newton_served", "cox_hazard_newton"),
    ):
        sdf = REGISTRY[served].build(spark, SF)
        odf = REGISTRY[original].build(spark, SF)
        assert sdf.columns == odf.columns, served
        assert sorted(map(tuple, sdf.collect())) == sorted(
            map(tuple, odf.collect())
        ), served


def test_token_shard_served_twin_matches_from_scratch(spark):
    sdf = REGISTRY["token_shard_plan_served"].build(spark, SF)
    odf = REGISTRY["token_shard_plan"].build(spark, SF)
    assert sdf.columns == odf.columns
    assert sorted(map(tuple, sdf.collect())) == sorted(
        map(tuple, odf.collect())
    )


def test_lpa_communities_matches_pure_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    baskets: dict = {}
    for ok, pk in zip(li.l_orderkey, li.l_partkey):
        baskets.setdefault(ok, set()).add(pk)
    from collections import Counter

    pair_counts: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[j])] += 1
    edges: dict = {}
    for (u, v), c in pair_counts.items():
        if c >= 2:
            edges.setdefault(u, []).append(v)
            edges.setdefault(v, []).append(u)
    labels = {n: n for n in edges}
    for _ in range(3):
        new = {}
        for n, nbrs in edges.items():
            cnt: Counter = Counter(labels[u] for u in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            # most frequent, ties -> smallest label
            top = min(l for l, c in cnt.items() if c == best[1])
            new[n] = top
        labels = new
    from collections import defaultdict

    comm: dict = defaultdict(list)
    for n, l in labels.items():
        comm[l].append(n)
    want = sorted(
        (
            (l, len(ns), min(ns), max(ns))
            for l, ns in comm.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r.community, r.n_parts, r.min_part, r.max_part)
        for r in _rows(spark, "lpa_communities_top20")
    ]
    assert got == want


def test_did_matches_pure_python(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    import datetime as dt

    cells = {}
    for ck, od, tp in zip(
        orders.o_custkey, orders.o_orderdate, orders.o_totalprice
    ):
        od = od.date() if hasattr(od, "hour") else od  # Timestamp -> date
        t = 1 if int(hashlib.md5(str(ck).encode()).hexdigest()[0], 16) % 2 == 0 else 0
        p = 1 if od >= dt.date(1998, 7, 1) else 0
        n, s = cells.get((t, p), (0, 0))
        cells[(t, p)] = (n + 1, s + math.floor(tp * 100 + 0.5))
    (row,) = _rows(spark, "did_order_value")
    assert (row.n_t1, row.s_t1) == cells[(1, 1)]
    assert (row.n_c0, row.s_c0) == cells[(0, 0)]
    m = lambda k: cells[k][1] / cells[k][0]  # noqa: E731
    did = (m((1, 1)) - m((1, 0))) - (m((0, 1)) - m((0, 0)))
    assert row.did_q == math.floor(did * 10000.0 + 0.5)


def test_ucb1_matches_pure_python(spark, events_pd):
    from collections import defaultdict

    daily = defaultdict(lambda: [0, 0])
    for et, v, ts in zip(
        events_pd.event_type, events_pd.value, events_pd.ts
    ):
        k = (ts.date(), et)
        daily[k][0] += 1
        daily[k][1] += 1 if v >= 200.0 else 0
    days = sorted({d for d, _ in daily})
    arms = sorted({a for _, a in daily})
    cum = {a: [0, 0] for a in arms}
    want = []
    for d in days:
        for a in arms:
            dn, ds = daily.get((d, a), (0, 0))
            cum[a][0] += dn
            cum[a][1] += ds
        nt = sum(c[0] for c in cum.values())
        best = None
        for a in arms:
            n, s = cum[a]
            if n == 0:
                continue
            iq = math.floor(
                (s / n + math.sqrt(2.0 * math.log(nt) / n)) * 1e6 + 0.5
            )
            key = (-iq, a)
            if best is None or key < best[0]:
                best = (key, a, n, nt, iq)
        want.append((d.isoformat(), best[1], best[2], best[3], best[4]))
    got = [
        (r.day, r.chosen_arm, r.n_arm, r.n_total, r.index_q)
        for r in _rows(spark, "ucb1_daily_choice")
    ]
    assert got == want


def test_kcenter_matches_numpy_greedy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    E = np.stack(emb.embedding.to_numpy()).astype(np.float64) * 127.0
    Q = (np.sign(E) * np.floor(np.abs(E) + 0.5)).astype(np.int64)
    ids = emb.vec_id.to_numpy().astype(np.int64)
    order = np.argsort(ids)
    Q, ids = Q[order], ids[order]
    i0 = int(np.where(ids == 0)[0][0])
    dmin = ((Q - Q[i0]) ** 2).sum(axis=1)
    want = [(1, 0, 0)]
    for t in range(2, 10):
        # argmax dist, tie -> smallest vec_id (ids sorted ascending)
        best = int(np.argmax(dmin))
        want.append((t, int(ids[best]), int(dmin[best])))
        if t <= 8:
            d = ((Q - Q[best]) ** 2).sum(axis=1)
            dmin = np.minimum(dmin, d)
    got = [
        (r.round, r.vec_id, r.sel_dist)
        for r in _rows(spark, "kcenter_coreset_seeds")
    ]
    assert got == want


def test_logrank_matches_pure_python(spark, events_pd):
    from collections import defaultdict

    ev = events_pd
    s_ts, p_ts = {}, {}
    for uid, et, ts in zip(ev.user_id, ev.event_type, ev.ts):
        if et == "signup" and (uid not in s_ts or ts < s_ts[uid]):
            s_ts[uid] = ts
    for uid, et, ts in zip(ev.user_id, ev.event_type, ev.ts):
        if et == "purchase" and uid in s_ts and ts >= s_ts[uid]:
            if uid not in p_ts or ts < p_ts[uid]:
                p_ts[uid] = ts
    horizon = max(ev.ts)
    byt = defaultdict(lambda: [0, 0, 0, 0])  # c, c1, d, d1
    for uid, st in s_ts.items():
        x = uid % 2
        evt = 1 if uid in p_ts else 0
        end = p_ts.get(uid, horizon)
        dur = (int(end.value // 1000) - int(st.value // 1000)) // 86400000000
        r = byt[dur]
        r[0] += 1
        r[1] += x
        r[2] += evt
        r[3] += evt * x
    n_t = n1_t = 0
    o1 = e1_q = v_q = 0
    for dur in sorted(byt, reverse=True):
        c, c1, d, d1 = byt[dur]
        n_t += c
        n1_t += c1
        o1 += d1
        if d > 0:
            e1_q += math.floor(d * n1_t / n_t * 1e6 + 0.5)
            if n_t > 1:
                v_q += math.floor(
                    d * (n1_t / n_t) * (1 - n1_t / n_t)
                    * (n_t - d) / (n_t - 1) * 1e6 + 0.5
                )
    (row,) = _rows(spark, "logrank_arm_test")
    assert row.n_subjects == len(s_ts)
    assert row.o1 == o1
    assert row.e1_q == e1_q
    assert row.v_q == v_q
    chi2 = (o1 - e1_q / 1e6) ** 2 / (v_q / 1e6)
    assert row.chi2_q == math.floor(chi2 * 1e6 + 0.5)


def test_ipw_ate_matches_pure_python(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    strata: dict = {}
    nt = nc = st = sc = 0
    for ck, pri, od, tp in zip(
        orders.o_custkey,
        orders.o_orderpriority,
        orders.o_orderdate,
        orders.o_totalprice,
    ):
        yr = od.year
        t = 1 if int(hashlib.md5(str(ck).encode()).hexdigest()[0], 16) % 2 == 0 else 0
        v = math.floor(tp * 100 + 0.5)
        r = strata.setdefault((pri, yr), [0, 0, 0, 0])  # n, nT, sT, sC
        r[0] += 1
        r[1] += t
        r[2] += t * v
        r[3] += (1 - t) * v
        nt += t
        nc += 1 - t
        st += t * v
        sc += (1 - t) * v
    n_used = n_strata = term_q = 0
    for n_b, n_t, s_t, s_c in strata.values():
        if n_t == 0 or n_t == n_b:
            continue
        n_used += n_b
        n_strata += 1
        term_q += math.floor(
            (s_t * n_b / n_t - s_c * n_b / (n_b - n_t)) * 10000.0 + 0.5
        )
    (row,) = _rows(spark, "ipw_ate_order_value")
    assert (row.n_used, row.n_strata) == (n_used, n_strata)
    assert row.naive_q == math.floor((st / nt - sc / nc) * 10000.0 + 0.5)
    assert row.ate_ipw_q == math.floor(term_q / n_used + 0.5)
