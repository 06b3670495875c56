"""Round-9 operator tests: Kaplan-Meier survival, portable bloom
pruning, DP noisy release, SQ4 asymmetric-distance ANN, U-shaped
attribution, seasonally-adjusted anomalies.

Every query's DuckDB-oracle replay is covered by the registry-wide
test_queries_oracle parametrization; these tests pin the SEMANTIC laws
the oracle comparison alone can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


def test_km_curve_laws(spark, sf_dir):
    """Kaplan-Meier invariants: the risk set telescopes exactly
    (n_risk[i+1] = n_risk[i] - d - c), ln-survival is non-increasing,
    and the curve starts at the full cohort size."""
    rows = sorted(
        (
            (r.duration_day, r.n_risk, r.n_events, r.n_censored, r.surv_lnq)
            for r in REGISTRY["kaplan_meier_conversion"]
            .fn(spark, sf_dir)
            .collect()
        ),
    )
    assert rows, "empty KM curve"
    # telescoping risk set
    for (d0, n0, e0, c0, _), (d1, n1, _, _, _) in zip(rows, rows[1:]):
        assert d0 < d1
        assert n1 == n0 - e0 - c0, (rows,)
    # cohort size = signups
    n_signup = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0][1] == n_signup
    # ln S(t) non-increasing (NULL = S hit 0, allowed only at the tail)
    lnqs = [r[4] for r in rows]
    non_null = [x for x in lnqs if x is not None]
    assert all(a >= b for a, b in zip(non_null, non_null[1:]))
    assert all(x is not None for x in lnqs[: len(non_null)])
    # replay the estimator in plain Python from the event/censor counts
    n_risk, ln_s = rows[0][1], 0
    for d, n, e, c, lnq in rows:
        assert n == n_risk
        if e < n:
            ln_s += math.floor(math.log((n - e) / n) * 1e9 + 0.5)
            assert lnq == ln_s, (d, lnq, ln_s)
        else:
            assert lnq is None
        n_risk -= e + c


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """The bloom guarantee: every exact semi-join survivor passes the
    filter (false positives allowed and accounted, false negatives
    never)."""
    from healthcare_aihw_etl_pipeline_spark.operators.portable_sketch import (
        bloom_build,
        bloom_probe,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey"
    )
    bits = bloom_build(keys, "c_custkey")
    probe = orders.select("o_orderkey", "o_custkey")
    passed = {
        r.o_orderkey
        for r in bloom_probe(probe, "o_custkey", bits).collect()
    }
    exact = {
        r.o_orderkey
        for r in probe.join(
            keys, probe["o_custkey"] == keys["c_custkey"], "left_semi"
        ).collect()
    }
    assert exact <= passed
    # the registry query's accounting agrees
    row = REGISTRY["bloom_prune_orders"].fn(spark, sf_dir).first()
    assert row.n_exact == len(exact)
    assert row.n_bloom == len(passed)
    assert row.false_pos == len(passed) - len(exact)


def test_bloom_probe_keeps_duplicate_rows(spark):
    """Duplicate probe rows that match must ALL survive (the pre-r10
    probe aggregated by the full row and collapsed duplicates into a
    false negative: probing [1,1,2] against {1,2} returned only [2])."""
    from healthcare_aihw_etl_pipeline_spark.operators.portable_sketch import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.createDataFrame([(1,), (2,)], "k BIGINT")
    bits = bloom_build(keys, "k")
    probe = spark.createDataFrame([(1,), (1,), (2,), (99,)], "k BIGINT")
    got = sorted(r.k for r in bloom_probe(probe, "k", bits).collect())
    # 99 may or may not pass (false positives allowed); 1,1,2 must.
    assert got[:3] == [1, 1, 2]


def test_bloom_probe_is_shuffle_free(spark, sf_dir):
    """Plan pin: the probe is a broadcast-bitmap per-row test — no
    Exchange (shuffle) anywhere on the fact side of the probe plan."""
    from healthcare_aihw_etl_pipeline_spark.operators.portable_sketch import (
        bloom_build,
        bloom_probe,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey"
    )
    out = bloom_probe(
        orders.select("o_orderkey", "o_custkey"), "o_custkey",
        bloom_build(keys, "c_custkey"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The only exchanges allowed are on the <=256-row bitmap build side
    # (under the BroadcastExchange); the fact side must reach the filter
    # straight from the scan.
    fact_side = plan.split("Broadcast", 1)[0]
    assert "Exchange" not in fact_side, fact_side
    assert "Generate" not in fact_side, fact_side  # no explode on the fact


def test_dp_release_reproducible_and_bounded(spark, sf_dir):
    """Seeded-DP contract: the release replays identically (that IS the
    seeded form's point), every cell is actually noised in micro-count
    quanta, and |noise| respects the inverse-CDF tail bound
    b*ln(1e15)."""
    from healthcare_aihw_etl_pipeline_spark.operators.privacy import DP_Q

    q = REGISTRY["dp_noised_priority_counts"]
    rel1 = {
        r.o_orderpriority: r.noisy_count_q for r in q.fn(spark, sf_dir).collect()
    }
    rel2 = {
        r.o_orderpriority: r.noisy_count_q
        for r in (q.build)(spark, sf_dir).collect()
    }
    assert rel1 == rel2
    true = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = 1.0 / 0.5  # sensitivity / epsilon
    bound = b * math.log(1e15) * DP_Q
    noises = [rel1[k] - true[k] * DP_Q for k in true]
    assert all(abs(x) <= bound for x in noises)
    assert any(x != 0 for x in noises)  # the release is actually noised


def test_sq4_adc_recall_vs_exact(spark, sf_dir):
    """Compressed-search quality: the 4-bit ADC top-10 must overlap the
    exact float L2 top-10 (>=5 of 10 on this corpus) and contain the
    query vector itself in its top 3 (self-distance = pure quantization
    error)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.where("vec_id = 0").select("embedding").first()[0]
    ]
    qarr = F.array(*[F.lit(v) for v in qv])
    vd = F.transform("embedding", lambda x: x.cast("double"))
    d2 = F.aggregate(
        F.zip_with(vd, qarr, lambda x, q: (x - q) * (x - q)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    exact = [
        r.vec_id
        for r in emb.select("vec_id", d2.alias("d2"))
        .orderBy(F.asc("d2"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    adc = [
        r.vec_id
        for r in REGISTRY["ann_sq4_adc_top10"].fn(spark, sf_dir).collect()
    ]
    assert 0 in adc[:3], adc
    assert len(set(adc) & set(exact)) >= 5, (adc, exact)


def test_u_shaped_attribution_conserves_value(spark, duck, sf_dir):
    """Conservation law (same as the decay form): channel credits incl.
    'direct' sum to total purchase value within one quantization
    half-ulp per fan-out row."""
    rows = REGISTRY["u_shaped_attribution"].fn(spark, sf_dir).collect()
    credited = sum(r.credited_q for r in rows)
    n_credits = sum(r.n_credits for r in rows)
    total_cents = duck.execute(
        "SELECT CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)"
        " FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert abs(credited - total_cents * 10_000) <= n_credits


def test_u_shaped_weights_on_planted_journey(spark):
    """Planted 4-touch journey: weights must be 40/10/10/40."""
    import datetime as dt

    from healthcare_aihw_etl_pipeline_spark.plans.round9_queries import (
        u_shaped_attribution,
    )
    import healthcare_aihw_etl_pipeline_spark.plans.round9_queries as r9
    import os
    import tempfile

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        (1, t(0), 7, "a", 0.0, "{}"),
        (2, t(10), 7, "b", 0.0, "{}"),
        (3, t(20), 7, "c", 0.0, "{}"),
        (4, t(30), 7, "d", 0.0, "{}"),
        (5, t(40), 7, "purchase", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r.channel: r.credited_q
            for r in u_shaped_attribution(spark, d).collect()
        }
    # 10.00 -> 1000 cents -> credit_q units = cents * 1e4
    assert out == {
        "a": 4_000_000,
        "b": 1_000_000,
        "c": 1_000_000,
        "d": 4_000_000,
    }, out


def test_dow_anomaly_zscores_center(spark, sf_dir):
    """Per-dow standardization law: within each day-of-week group the
    z-scores sum to ~0 (exact moments; quantization drift only) and the
    anomaly flag equals |z| > 3."""
    rows = REGISTRY["dow_adjusted_anomalies"].fn(spark, sf_dir).collect()
    assert rows
    by_dow: dict[int, list] = {}
    for r in rows:
        by_dow.setdefault(r.dow, []).append(r)
    for dow, rs in by_dow.items():
        s = sum(r.z_milli for r in rs)
        assert abs(s) <= len(rs), (dow, s)  # half-ulp per row
        for r in rs:
            assert r.anomaly == (abs(r.z_milli) > 3000) or abs(
                abs(r.z_milli) - 3000
            ) <= 1
