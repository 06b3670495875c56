"""Round-8 operator tests: BM25/inverted index, A-ES weighted
sampling, SCD2 history, quality audit, sampled quantile sketch.

Each new registered query also replays against its DuckDB oracle at
the test scale factor (the same check the driver runs at sf0.01)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

R8_QUERIES = [
    "bm25_search_top10",
    "inverted_index_top20",
    "phrase_search_top10",
    "weighted_sample_orders",
    "scd2_user_tier_history",
    "scd2_temporal_join",
    "data_quality_audit",
    "quantile_sketch_prices",
    "doc_bigram_nll_top20",
    "supplier_balance_distribution",
    "copurchase_triangle_count",
    "pivot_dynamic_priority",
    "bm25_eval_screen_top3",
]


def test_pivot_dynamic_caps_domain(spark, sf_dir):
    """The discovery collect is bounded: a domain past max_domain raises
    instead of materializing unbounded columns."""
    import pytest
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.reshape import (
        pivot_sum_dynamic,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("string").alias("wide"),
        F.lit(1).alias("m"),
    )
    with pytest.raises(ValueError, match="max_domain"):
        pivot_sum_dynamic(o, "k", "wide", "m", max_domain=5)


def test_scd2_temporal_join_covers_every_event(spark, duck, sf_dir):
    """Interval-correctness proof: each event joins EXACTLY one SCD2
    interval, so the joined event count equals the raw event count."""
    q = REGISTRY["scd2_temporal_join"].fn(spark, sf_dir)
    joined_total = sum(r.n_events for r in q.collect())
    raw_total = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert joined_total == raw_total


@pytest.mark.parametrize("name", R8_QUERIES)
def test_round8_query_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sp = q.fn(spark, sf_dir)
    cols = sorted(sp.columns)
    got = sorted(
        tuple(str(r[c]) for c in cols) for r in sp.collect()
    )
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = sorted(
        tuple(str(r[i]) for i in idx) for r in res.fetchall()
    )
    assert sorted(ocols) == cols
    assert got == want
    assert len(got) > 0


def test_bm25_ranks_rare_term_docs_first(spark):
    """A doc matching the rare query term outranks a doc stuffed with a
    ubiquitous term: idf must dominate raw tf."""
    from healthcare_aihw_etl_pipeline_spark.operators.search import bm25_topk

    rows = [(i, "common filler text here") for i in range(20)]
    rows.append((100, "rareword appears once common"))
    rows.append((101, "common common common common common common"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, "text", "doc_id", ["rareword", "common"], k=3)
    got = [r.doc_id for r in top.collect()]
    assert got[0] == 100
    # every score is positive and quantized consistently
    for r in top.collect():
        assert r.score_q > 0
        assert math.isclose(r.score, r.score_q / 10_000.0)


def test_bm25_empty_terms_rejected(spark):
    from healthcare_aihw_etl_pipeline_spark.operators.search import bm25_topk

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", [], k=3)


def test_inverted_index_preview_capped_and_sorted(spark):
    from healthcare_aihw_etl_pipeline_spark.operators.search import (
        inverted_index_stats,
    )

    rows = [(i, "tok") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = inverted_index_stats(docs, "text", "doc_id", preview_docs=3)
    r = out.collect()[0]
    assert r.token == "tok"
    assert r.doc_freq == 10
    assert r.total_tf == 10
    assert r.posting_preview == "0,1,2"  # capped at 3 smallest, sorted


def test_weighted_sample_prefers_heavy_items(spark):
    """A-ES: one item with 1000x the weight of 500 others must be
    sampled into a top-50 draw with overwhelming probability (its key
    ln(u)/w is ~1000x closer to zero)."""
    from healthcare_aihw_etl_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 1.0) for i in range(500)] + [(1000, 1000.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r.id for r in weighted_sample_topk(df, "id", "w", 50).collect()}
    assert 1000 in got
    assert len(got) == 50
    # non-positive weights are excluded, and determinism: same set twice
    df2 = df.union(
        spark.createDataFrame([(2000, 0.0), (2001, -5.0)], "id long, w double")
    )
    got2 = {r.id for r in weighted_sample_topk(df2, "id", "w", 50).collect()}
    assert got2 == got


def test_weighted_sample_u_is_exact_double(spark):
    """u = (h+1)/2^52 must be exactly representable (power-of-two
    divisor) and lie in (0, 1]."""
    from healthcare_aihw_etl_pipeline_spark.operators.sampling import (
        md5_uniform,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    us = [r.u for r in df.select(md5_uniform("id").alias("u")).collect()]
    for u in us:
        assert 0.0 < u <= 1.0
        # scaling back by 2^52 recovers an exact integer
        assert (u * float(1 << 52)).is_integer()


def test_scd2_history_runs_and_intervals(spark):
    """Hand-built change stream: runs collapse, intervals are half-open
    and chain exactly, last run per key is current."""
    import datetime as dt

    from healthcare_aihw_etl_pipeline_spark.operators.scd import scd2_history

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 10, "a"),
        (1, t(1), 11, "a"),  # same attr: swallowed into first run
        (1, t(2), 12, "b"),  # change
        (1, t(3), 13, "a"),  # change back: new run, not merged
        (2, t(0), 20, "x"),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp_ntz, eid int, attr string"
    )
    out = scd2_history(df, "k", "attr", "ts", "eid").collect()
    hist = sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out),
        key=lambda x: (x[0], x[2]),
    )
    assert hist == [
        (1, "a", t(0), t(2), False),
        (1, "b", t(2), t(3), False),
        (1, "a", t(3), None, True),
        (2, "x", t(0), None, True),
    ]


def test_quality_audit_detects_planted_violations(spark):
    from healthcare_aihw_etl_pipeline_spark.operators import quality

    rows = [
        (1, 1, 5.0, "A"),
        (1, 1, 60.0, "N"),  # dup key + out-of-range value
        (2, 1, None, "Z"),  # null value + bad flag
    ]
    df = spark.createDataFrame(rows, "k int, ln int, v double, flag string")
    rep = {
        r.check_name: (r.metric, r.passed)
        for r in quality.audit(
            df,
            [
                quality.completeness("v"),
                quality.uniqueness("k", "ln"),
                quality.in_range("v", 0.0, 50.0),
                quality.accepted_values("flag", ["A", "N"]),
            ],
        ).collect()
    }
    assert rep["completeness(v)"] == (2.0 / 3.0, False)
    assert rep["uniqueness(k,ln)"] == (2.0 / 3.0, False)
    assert rep["in_range(v,0.0,50.0)"] == (1.0, False)
    assert rep["accepted_values(flag)"] == (1.0, False)

    with pytest.raises(ValueError):
        quality.audit(df, [])


def test_referential_orphans_counts(spark):
    from healthcare_aihw_etl_pipeline_spark.operators.quality import (
        referential_orphans,
    )

    fact = spark.createDataFrame([(1,), (2,), (9,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    r = referential_orphans(fact, dim, "fk", "pk", "ref").collect()[0]
    assert (r.check_name, r.metric, r.passed) == ("ref", 1.0, False)


def test_sampled_rank_quantiles_exact_on_known_sample(spark):
    """Rank selection formula: value at floor((n-1)q)+1 over a fully
    known 11-element sample."""
    from healthcare_aihw_etl_pipeline_spark.operators.portable_sketch import (
        sampled_rank_quantiles,
    )

    df = spark.createDataFrame(
        [(v * 10, str(v)) for v in range(11)], "val long, rid string"
    )
    out = {
        r.q: (r.val, r.sample_n)
        for r in sampled_rank_quantiles(
            df, "val", "rid", [0.0, 0.5, 1.0]
        ).collect()
    }
    assert out == {0.0: (0, 11), 0.5: (50, 11), 1.0: (100, 11)}


def test_quantile_sketch_brackets_exact_quantiles(spark, duck, sf_dir):
    """The p=1/4 sketch's median must land near the exact corpus median
    (within a generous relative band — it is a sample estimate)."""
    q = REGISTRY["quantile_sketch_prices"].fn(spark, sf_dir)
    est = {r.q: r.price_cents for r in q.collect()}
    exact = duck.execute(
        "SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS c FROM lineitem"
    ).fetchall()
    vals = sorted(v for (v,) in exact)
    true_median = vals[(len(vals) - 1) // 2]
    assert abs(est[0.5] - true_median) / true_median < 0.1


def test_phrase_search_counts_adjacent_pairs_only(spark):
    """Positional semantics: 'a b' matches only adjacency in order —
    not reversed pairs, not gapped pairs — and counts multiplicity."""
    from healthcare_aihw_etl_pipeline_spark.operators.search import (
        phrase_search_topk,
    )

    rows = [
        (1, "a b x a b"),   # two hits
        (2, "b a"),          # reversed: no hit
        (3, "a x b"),        # gapped: no hit
        (4, "a b"),          # one hit
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n_hits
        for r in phrase_search_topk(docs, "text", "doc_id", ["a", "b"]).collect()
    }
    assert got == {1: 2, 4: 1}

    import pytest

    with pytest.raises(ValueError):
        phrase_search_topk(docs, "text", "doc_id", ["a"])


def test_inverted_index_fallback_matches_default_on_unique_ids(spark):
    """The partition-local default and the window fallback agree on a
    unique-id corpus; on DUPLICATE id rows only the fallback is correct
    (the default's per-partition distinct sum is documented to require
    one row per id)."""
    from healthcare_aihw_etl_pipeline_spark.operators.search import (
        inverted_index_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a b b c"), (2, "b c"), (3, "c c c")], "doc_id long, text string"
    )
    fast = {
        r.token: (r.doc_freq, r.total_tf, r.posting_preview)
        for r in inverted_index_stats(docs, "text", "doc_id").collect()
    }
    slow = {
        r.token: (r.doc_freq, r.total_tf, r.posting_preview)
        for r in inverted_index_stats(
            docs, "text", "doc_id", assume_unique_ids=False
        ).collect()
    }
    assert fast == slow
    assert fast["c"] == (3, 5, "1,2,3")
    # duplicate-id rows: the fallback counts each (doc, token) pair once
    dup = spark.createDataFrame(
        [(1, "a"), (1, "a b")], "doc_id long, text string"
    )
    got = {
        r.token: r.doc_freq
        for r in inverted_index_stats(
            dup, "text", "doc_id", assume_unique_ids=False
        ).collect()
    }
    assert got == {"a": 1, "b": 1}
