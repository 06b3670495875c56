"""Round-12 operator tests: Cox partial-likelihood Newton step (vs an
independent pure-Python survival computation from raw events), logistic
Newton step (vs numpy, plus the behavioral law that the step improves
log-likelihood), BPE merge training (vs a direct Python implementation
of the Sennrich merge loop), winnowing fast-path equivalence (planted
shared-run corpus flagged identically by the md5 and xxhash64 paths),
and the fused sweep profile (column-exact vs its two source queries)."""

import math
import re
from collections import Counter

import duckdb
import numpy as np

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
COX_Q = 1_000_000


def _rows(spark, name, sf=SF):
    return REGISTRY[name].build(spark, sf).collect()


# ---------------------------------------------------------------------------
# Cox proportional hazards


def _py_cox_frame():
    """(x, evt, dur) per signup user, computed from raw event rows in
    plain Python — independent of both engines' SQL."""
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us, event_type"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    horizon = max(us for _, us, _ in rows)
    signup: dict[int, int] = {}
    for u, us, et in rows:
        if et == "signup" and (u not in signup or us < signup[u]):
            signup[u] = us
    purchase: dict[int, int] = {}
    for u, us, et in rows:
        if et == "purchase" and u in signup and us >= signup[u]:
            if u not in purchase or us < purchase[u]:
                purchase[u] = us
    frame = []
    for u, s_us in signup.items():
        p_us = purchase.get(u)
        evt = 1 if p_us is not None else 0
        end = p_us if p_us is not None else horizon
        # truncation toward zero == floor for the non-negative duration
        frame.append((u % 2, evt, (end - s_us) // DAY_US))
    return frame


def test_cox_newton_matches_python_replication(spark):
    frame = _py_cox_frame()
    n = len(frame)
    xs = sum(x for x, _, _ in frame)
    byt: dict[int, list[int]] = {}
    for x, evt, dur in frame:
        agg = byt.setdefault(dur, [0, 0, 0, 0])  # n_t, x_t, d_t, dx_t
        agg[0] += 1
        agg[1] += x
        agg[2] += evt
        agg[3] += evt * x
    score_uq = info_iq = 0
    n_events = n_event_days = 0
    seen_n = seen_x = 0
    for dur in sorted(byt):
        n_t, x_t, d_t, dx_t = byt[dur]
        s0 = n - seen_n
        s1 = xs - seen_x
        seen_n += n_t
        seen_x += x_t
        if d_t == 0:
            continue
        du_q = (d_t * s1 * COX_Q) // s0
        score_uq += dx_t * COX_Q - du_q
        info_iq += (du_q * (s0 - s1)) // s0
        n_events += d_t
        n_event_days += 1

    [row] = _rows(spark, "cox_hazard_newton")
    assert row.n_subjects == n
    assert row.n_treated == xs
    assert row.n_events == n_events
    assert row.n_event_days == n_event_days
    assert row.score_uq == score_uq
    assert row.info_iq == info_iq
    assert math.isclose(row.beta1, score_uq / info_iq, rel_tol=1e-12)

    # Against the UNQUANTIZED float score/information: the millionth
    # quantization must not move beta materially at this scale.
    u = i = 0.0
    seen_n = seen_x = 0
    for dur in sorted(byt):
        n_t, x_t, d_t, dx_t = byt[dur]
        s0 = n - seen_n
        s1 = xs - seen_x
        seen_n += n_t
        seen_x += x_t
        if d_t == 0:
            continue
        u += dx_t - d_t * s1 / s0
        i += d_t * (s1 / s0) * (1 - s1 / s0)
    assert math.isclose(row.beta1, u / i, rel_tol=1e-3, abs_tol=1e-6)


def test_cox_score_sign_is_treated_event_excess(spark):
    """sign(U) compares treated event share against treated risk share —
    the score test's defining direction."""
    [row] = _rows(spark, "cox_hazard_newton")
    assert row.info_iq > 0
    assert (row.beta1 > 0) == (row.score_uq > 0)


# ---------------------------------------------------------------------------
# Logistic regression Newton step


def _logit_xy():
    rows = duckdb.sql(
        "SELECT date_diff('day', DATE '1992-01-01', o_orderdate),"
        " CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
        f" FROM '{SF}/orders.parquet'"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    return x, y


def test_logistic_newton_matches_numpy(spark):
    x, y = _logit_xy()
    n = len(x)
    sy = int(y.sum())
    sx = int(x.sum())
    sxx = int((x * x).sum())
    sxy = int((x * y).sum())
    det = float(n) * float(sxx) - float(sx) * float(sx)
    g0 = float(2 * sy - n)
    g1 = float(2 * sxy - sx)
    beta0 = 2.0 * (float(sxx) * g0 - float(sx) * g1) / det
    beta1 = 2.0 * (float(n) * g1 - float(sx) * g0) / det

    [row] = _rows(spark, "logistic_newton_step")
    assert (row.n, row.n_pos, row.sx, row.sxx, row.sxy) == (
        n, sy, sx, sxx, sxy,
    )
    assert math.isclose(row.beta0, beta0, rel_tol=1e-12)
    assert math.isclose(row.beta1, beta1, rel_tol=1e-12)


def test_logistic_newton_step_improves_loglik(spark):
    """The behavioral law: one Newton step from 0 must increase the
    Bernoulli log-likelihood on the training data."""
    x, y = _logit_xy()
    [row] = _rows(spark, "logistic_newton_step")

    def loglik(b0, b1):
        z = b0 + b1 * x
        # log sigmoid via logaddexp for numerical stability
        return float((y * z - np.logaddexp(0.0, z)).sum())

    assert loglik(row.beta0, row.beta1) > loglik(0.0, 0.0)


# ---------------------------------------------------------------------------
# BPE merge training


def _py_bpe(rounds=8):
    rows = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    pat = re.compile(r"^[a-z]{2,16}$")
    vocab = Counter()
    for (text,) in rows:
        for w in text.strip().lower().split():
            if pat.fullmatch(w):
                vocab[w] += 1
    words = {w: tuple(w) for w in vocab}
    merges = []
    for rnd in range(1, rounds + 1):
        pair_counts: Counter = Counter()
        for w, syms in words.items():
            c = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (a, b), c = min(
            pair_counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((rnd, a, b, a + b, c))
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def test_bpe_merge_training_matches_python(spark):
    expect = _py_bpe()
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in _rows(spark, "bpe_merge_training")
    ]
    assert got == expect
    assert len(got) == 8


# ---------------------------------------------------------------------------
# Winnowing fast path ≡ portable path on planted shared runs


def test_winnow_fast_flags_same_planted_structure(spark, tmp_path):
    """Both hash paths must flag the planted sharing: a 3-doc shared run
    and a 2-doc shared run (locality guarantee: any shared token run of
    >= k + w - 1 = 6 tokens yields >= 1 shared fingerprint), and no
    fingerprint may span unrelated docs."""
    shared_a = "alpha beta gamma delta epsilon zeta eta theta"
    shared_b = "one two three four five six"
    docs = [
        (0, f"intro {shared_a} outro0"),
        (1, f"start1 {shared_a} end1 filler"),
        (2, f"{shared_a} tail2 pad pad2"),
        (3, f"lead3 {shared_b} trail3"),
        (4, f"{shared_b} coda4 extra4 more4"),
        (5, "completely different words without any overlap here ok"),
        (6, "another unique document text nothing shared at all yes"),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({d}, '{t}', 'en', 'src', {len(t)})" for d, t in docs)
        + ") AS t(doc_id, text, lang, source, n_chars)"
    )
    con.execute(
        f"COPY documents TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()

    for name in ("winnow_shared_fingerprints", "winnow_shared_fingerprints_fast"):
        rows = REGISTRY[name].build(spark, str(tmp_path)).collect()
        by_ndocs = Counter(r.n_docs for r in rows)
        assert max(by_ndocs) == 3, name  # the 3-doc run, nothing beyond
        assert by_ndocs[3] >= 1, name
        assert by_ndocs[2] >= 1, name  # the 2-doc run
        # the 3-doc sharing must anchor at the first sharing doc
        top = [r for r in rows if r.n_docs == 3]
        assert all(r.first_doc == 0 for r in top), name


# ---------------------------------------------------------------------------
# Fused sweep profile ≡ its two source queries


def test_sweep_profile_fuses_both_queries_exactly(spark):
    fused = {r.day: r for r in _rows(spark, "interval_sweep_profile")}
    peak = {r.day: r for r in _rows(spark, "max_concurrent_sessions")}
    cover = {r.day: r for r in _rows(spark, "interval_union_coverage")}
    assert set(fused) == set(peak) == set(cover)
    for day, f in fused.items():
        assert f.n_sessions == peak[day].n_sessions
        assert f.max_concurrent == peak[day].max_concurrent
        assert f.covered_us == cover[day].covered_us
        assert f.total_session_us == cover[day].total_session_us
        assert f.user_us_integral == cover[day].user_us_integral
        # sweep identities
        assert f.user_us_integral == f.total_session_us
        assert f.covered_us <= f.total_session_us


# ---------------------------------------------------------------------------
# Exact ROC-AUC via the Mann-Whitney identity


def test_roc_auc_matches_python_midranks(spark):
    x, y = _logit_xy()
    # pure-Python midrank AUC over the score groups
    from collections import defaultdict

    groups: dict[float, list[int]] = defaultdict(lambda: [0, 0])
    for s, lbl in zip(x, y):
        groups[float(s)][int(lbl)] += 1
    prev = 0
    r2p = 0
    n_pos = n_neg = 0
    for s in sorted(groups):
        n0, n1 = groups[s]
        c = n0 + n1
        r2p += n1 * (2 * prev + c + 1)
        prev += c
        n_pos += n1
        n_neg += n0
    u2 = r2p - n_pos * (n_pos + 1)
    auc = u2 / (2.0 * n_pos * n_neg)

    [row] = _rows(spark, "roc_auc_order_age")
    assert (row.n_pos, row.n_neg, row.u2) == (n_pos, n_neg, u2)
    assert math.isclose(row.auc, auc, rel_tol=1e-12)
    assert math.isclose(row.gini_index, 2 * auc - 1, rel_tol=1e-9)
    assert 0.0 <= row.auc <= 1.0


def test_roc_auc_direction_agrees_with_logistic_slope(spark):
    """AUC > 1/2 iff the age feature separates positives upward — the
    same direction the logistic Newton step must find (beta1 > 0)."""
    [auc_row] = _rows(spark, "roc_auc_order_age")
    [fit_row] = _rows(spark, "logistic_newton_step")
    assert (auc_row.auc > 0.5) == (fit_row.beta1 > 0)


# ---------------------------------------------------------------------------
# Isotonic regression ≡ exact PAVA (minimax theorem)


def test_isotonic_fit_equals_fraction_pava(spark):
    """The max-min formula the query computes equals the PAVA solution
    (Barlow et al.), and truncation commutes with the lattice ops — so
    floor(Q * exact PAVA fit) must match the engine bit-for-bit."""
    from fractions import Fraction

    ISO_Q = 1_000_000_000
    rows = duckdb.sql(
        "SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS s,"
        " COUNT(*) AS cnt,"
        " SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ones"
        f" FROM '{SF}/orders.parquet' GROUP BY s ORDER BY s"
    ).fetchall()
    # weighted PAVA: blocks of (weight, sum_y); merge while decreasing
    blocks = []  # [w, sy]
    for _, cnt, ones in rows:
        blocks.append([cnt, ones])
        while len(blocks) > 1 and (
            Fraction(blocks[-2][1], blocks[-2][0])
            >= Fraction(blocks[-1][1], blocks[-1][0])
        ):
            w2, s2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
    # expand blocks back to per-s fits
    expected = {}
    idx = 0
    for w, sy in blocks:
        # consume rows until the block's weight is exhausted
        acc = 0
        while acc < w:
            s, cnt, _ = rows[idx]
            expected[s] = (sy * ISO_Q) // w  # floor(Q * block mean)
            acc += cnt
            idx += 1
    got = {
        r.age_day: r.iso_q
        for r in _rows(spark, "isotonic_calibration_by_age")
    }
    assert got == expected
    # monotone non-decreasing by construction
    seq = [got[k] for k in sorted(got)]
    assert all(a <= b for a, b in zip(seq, seq[1:]))


# ---------------------------------------------------------------------------
# Split-conformal coverage guarantee


def test_conformal_interval_covers_at_level(spark):
    """The defining property: held-out coverage of the calibrated
    interval is >= 1 - alpha = 90% up to sampling noise (exchangeable
    md5 splits), and the interval is not vacuous."""
    [row] = _rows(spark, "conformal_interval_price")
    assert row.n_train > 0 and row.n_cal > 0 and row.n_eval > 0
    # finite-sample guarantee with slack for the eval half's noise
    assert row.coverage_ppm >= 870_000, row.coverage_ppm
    # non-vacuous: the interval must not cover everything
    assert row.coverage_ppm < 999_999
    assert 0 < row.q_cents
    assert row.covered <= row.n_eval


# ---------------------------------------------------------------------------
# t-closeness audit ≡ pure-Python variational distance


def test_t_closeness_matches_python(spark):
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT),"
        f" c_mktsegment FROM '{SF}/customer.parquet'"
    ).fetchall()
    n_total = len(rows)
    seg_n = Counter(seg for _, _, seg in rows)
    groups = defaultdict(Counter)
    for nat, band, seg in rows:
        groups[(nat, band)][seg] += 1
    bands = defaultdict(lambda: [0, 0, 0, 0])  # n, max, sum, above
    for cnts in groups.values():
        k = sum(cnts.values())
        present_dev = sum(
            abs(c * n_total - seg_n[s] * k) for s, c in cnts.items()
        )
        present_seg = sum(seg_n[s] for s in cnts)
        vd_ppm = (present_dev + (n_total - present_seg) * k) * 500000 // (
            k * n_total
        )
        assert 0 <= vd_ppm <= 1_000_000
        lo = 1 if k < 2 else 2 if k < 5 else 5 if k < 20 else 20
        b = bands[lo]
        b[0] += 1
        b[1] = max(b[1], vd_ppm)
        b[2] += vd_ppm
        b[3] += vd_ppm > 200_000
    got = {
        r.band_lo: (r.n_groups, r.max_vd_ppm, r.mean_vd_ppm, r.n_above_t)
        for r in _rows(spark, "t_closeness_audit")
    }
    want = {
        lo: (b[0], b[1], b[2] // b[0], b[3]) for lo, b in bands.items()
    }
    assert got == want


def test_cox_newton_one_row_even_with_zero_events(spark, tmp_path):
    """A corpus with signups but no qualifying purchases must still
    return ONE row (matching the oracle's ungrouped-aggregate shape):
    subjects populated, event sums NULL, beta NULL."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 10:00:00', 7, 'signup', 1.0, '{}'),"
        "(2, TIMESTAMP '2024-01-02 10:00:00', 8, 'signup', 1.0, '{}'),"
        "(3, TIMESTAMP '2024-01-03 10:00:00', 8, 'click', 1.0, '{}')"
        ") AS t(event_id, ts, user_id, event_type, value, props)"
    )
    con.execute(
        f"COPY events TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    rows = REGISTRY["cox_hazard_newton"].build(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    [r] = rows
    assert r.n_subjects == 2 and r.n_treated == 1
    assert r.n_event_days == 0
    assert r.n_events is None and r.score_uq is None and r.beta1 is None


# ---------------------------------------------------------------------------
# PCA power iteration vs numpy


def test_pca_power_component_matches_numpy(spark):
    """Exact replication of the integer pipeline in numpy int64, plus
    the analytic laws: Rayleigh quotient <= lambda_1 and the
    two-iteration direction already well aligned with the true top
    eigenvector of the same quantized mean Gram matrix."""
    VQ = 1_000_000   # direction surface quantum
    ITQ = 10_000     # iterate rescale bound (see _PCA_ITQ)
    arrs = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    x = np.stack([np.array(a[0], dtype=np.float64) for a in arrs])
    xq = np.floor(x * 1000 + 0.5).astype(np.int64)
    n = len(xq)
    gram = xq.T @ xq
    # numpy // FLOORS while both engines truncate toward zero, so every
    # integer division below goes through the sign-split form
    m = np.sign(gram) * (np.abs(gram) // n)
    v1 = m.sum(axis=1)
    s1 = np.abs(v1).max() // ITQ + 1
    v1r = np.sign(v1) * (np.abs(v1) // s1)
    v2 = m @ v1r
    mx = np.abs(v2).max()
    direction = np.sign(v2 * VQ) * (np.abs(v2 * VQ) // mx)
    num = int((v2 * v1r).sum())
    den = int((v1r * v1r).sum())
    rq = abs(num) // den * (1 if num >= 0 else -1)

    rows = _rows(spark, "pca_power_component")
    assert [r.dim for r in rows] == list(range(1, 65))
    assert [r.direction_q for r in rows] == [int(d) for d in direction]
    assert rows[0].n_vectors == n
    assert rows[0].rayleigh_q == rq

    # analytic checks on the float spectrum of the same matrix.
    # NOTE: the synthetic embeddings are near-isotropic (tiny spectral
    # gap), so two iterations cannot land on the true eigenvector —
    # like kmeans_refine_clusters, the operator IS the exact bounded
    # iteration step, not a convergence claim. What must hold: the
    # integer pipeline tracks the float power iteration (quantization
    # does not distort the step), the Rayleigh quotient is bounded by
    # lambda_1, and the step IMPROVES it over the starting vector.
    mf = m.astype(np.float64)
    w, _ = np.linalg.eigh(mf)
    lam1 = w[-1]
    assert rq <= lam1 + 1  # Rayleigh bound (integer truncation slack)
    ones = np.ones(64)
    float_v2 = mf @ (mf @ ones)
    cos_step = abs(np.dot(v2, float_v2)) / (
        np.linalg.norm(v2) * np.linalg.norm(float_v2)
    )
    assert cos_step > 0.9999, cos_step
    rq0 = float(ones @ mf @ ones) / 64.0
    assert rq >= rq0 - 1  # power iteration is RQ-non-decreasing on PSD
