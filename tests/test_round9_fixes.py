"""Round-9 regression tests for the four ADVICE defects:

1. scd2_history: value->NULL attribute transitions must start a new run
   (null-safe run-start detection), and NULL runs get their own period.
2. streaming drift psi_of_counts: stream buckets absent from the
   reference must still score (epsilon-smoothed) and a fully-novel
   window must trip `drifted` instead of vanishing.
3. pivot_sum_dynamic: non-string pivot domains (ints/dates) must match
   natively — no silently all-NULL columns from str() coercion — and
   sort in value order, not lexicographically.
4. shard_by_budget: duplicate order keys with a tiebreak column give a
   deterministic, partition-layout-independent assignment.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_scd2_history_null_attribute_transitions(spark):
    """value->NULL and NULL->value are run boundaries; a NULL run gets
    its own (valid_from, valid_to) period instead of being absorbed
    into the prior value's interval."""
    from healthcare_aihw_etl_pipeline_spark.operators.scd import scd2_history

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 10, "a"),
        (1, t(1), 11, None),  # value -> NULL: must start a run
        (1, t(2), 12, None),  # NULL run continues (null-safe equal)
        (1, t(3), 13, "a"),  # NULL -> value: new run
        (2, t(0), 20, None),  # key whose history STARTS null
        (2, t(1), 21, "x"),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp_ntz, eid int, attr string"
    )
    hist = sorted(
        (
            (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(df, "k", "attr", "ts", "eid").collect()
        ),
        key=lambda x: (x[0], x[2]),
    )
    assert hist == [
        (1, "a", t(0), t(1), False),
        (1, None, t(1), t(3), False),
        (1, "a", t(3), None, True),
        (2, None, t(0), t(1), False),
        (2, "x", t(1), None, True),
    ]


def _psi_score(spark, ref_rows, stream_rows):
    from healthcare_aihw_etl_pipeline_spark.streaming.drift import (
        psi_of_counts,
    )

    ref = spark.createDataFrame(
        ref_rows, "key string, bucket long, c_ref long, n_ref long"
    )
    counts = spark.createDataFrame(
        stream_rows, "window_start string, key string, bucket long, c long"
    )
    return {
        (r.window_start, r.key): r
        for r in psi_of_counts(counts, ref).collect()
    }


def test_psi_fully_novel_window_alerts(spark):
    """A window whose values land ENTIRELY in buckets the reference
    never saw must emit a row with drifted=True and full unmatched
    mass — the inner-join form emitted nothing at all."""
    ref = [("click", 0, 50, 100), ("click", 1, 50, 100)]
    stream = [("w1", "click", 7, 30), ("w1", "click", 9, 10)]
    got = _psi_score(spark, ref, stream)
    assert ("w1", "click") in got
    r = got[("w1", "click")]
    assert r.drifted is True
    assert r.unmatched_buckets == 2
    assert abs(r.unmatched_mass - 1.0) < 1e-12
    # epsilon-smoothed PSI of an all-novel window is enormous (~p*ln(p*1e6))
    assert r.psi > 1.0


def test_psi_matched_buckets_unchanged_and_partial_novel(spark):
    """Matched-bucket scoring is the same algebra as before (a window
    identical to the reference scores ~0), and a partially-novel window
    reports the unmatched diagnostics."""
    ref = [("click", 0, 50, 100), ("click", 1, 50, 100)]
    same = [("w1", "click", 0, 50), ("w1", "click", 1, 50)]
    got = _psi_score(spark, ref, same)[("w1", "click")]
    assert got.psi_q == 0 and got.drifted is False
    assert got.unmatched_buckets == 0 and got.unmatched_mass == 0.0

    mixed = [("w2", "click", 0, 90), ("w2", "click", 5, 10)]
    r = _psi_score(spark, ref, mixed)[("w2", "click")]
    assert r.unmatched_buckets == 1
    assert abs(r.unmatched_mass - 0.1) < 1e-12
    assert r.drifted is True  # 10% of mass in a never-seen bucket


def test_psi_ref_bucket_vanishing_scores(spark):
    """Two-sided smoothing: a reference bucket with ZERO stream count in
    a window must still score (epsilon-smoothed p2). Mass fully
    vanishing from one of two equal reference buckets is a huge shift —
    the one-sided form scored only the surviving bucket (~0.35)."""
    import math

    ref = [("click", 0, 50, 100), ("click", 1, 50, 100)]
    stream = [("w1", "click", 1, 100)]
    r = _psi_score(spark, ref, stream)[("w1", "click")]
    eps = 1e-6
    want = math.floor((1.0 - 0.5) * math.log(1.0 / 0.5) * 1e6 + 0.5) + (
        math.floor((eps - 0.5) * math.log(eps / 0.5) * 1e6 + 0.5)
    )
    assert r.psi_q == want, (r.psi_q, want)
    assert r.n_buckets == 2
    assert r.drifted is True
    assert r.unmatched_buckets == 0 and r.unmatched_mass == 0.0


def test_pivot_dynamic_native_numeric_domain(spark):
    """Integer pivot values must produce populated columns (native
    matching, not str()-rendered) ordered by VALUE: 2 before 10."""
    from healthcare_aihw_etl_pipeline_spark.operators.reshape import (
        pivot_sum_dynamic,
    )

    df = spark.createDataFrame(
        [("a", 2, 1.0), ("a", 10, 2.0), ("b", 2, 3.0)],
        "k string, piv int, m double",
    )
    out = pivot_sum_dynamic(df, "k", "piv", "m")
    assert out.columns == ["k", "2", "10"]  # value order, not lexicographic
    rows = {r.k: (r["2"], r["10"]) for r in out.collect()}
    assert rows == {"a": (1.0, 2.0), "b": (3.0, None)}


def test_pivot_dynamic_native_date_domain(spark):
    """Date pivot values: every cell populated (no silent all-NULL
    columns from rendering drift)."""
    from healthcare_aihw_etl_pipeline_spark.operators.reshape import (
        pivot_sum_dynamic,
    )

    d1, d2 = dt.date(2024, 1, 2), dt.date(2024, 1, 10)
    df = spark.createDataFrame(
        [("a", d1, 1.0), ("a", d2, 2.0)], "k string, piv date, m double"
    )
    out = pivot_sum_dynamic(df, "k", "piv", "m")
    row = out.collect()[0]
    assert [row[c] for c in out.columns[1:]] == [1.0, 2.0]


def test_shard_by_budget_tiebreak_total_order(spark):
    """With duplicate order keys and a tiebreak column, the assignment
    equals the sequential definition over (order, tiebreak) and is
    identical across partition layouts."""
    from healthcare_aihw_etl_pipeline_spark.operators.layout import (
        shard_by_budget,
    )

    rows = [
        # (order key with dups, unique id, cost)
        (1, 100, 3), (1, 101, 4), (2, 102, 5), (2, 103, 1),
        (2, 104, 9), (3, 105, 2), (3, 106, 7), (3, 107, 1),
    ]
    df = spark.createDataFrame(rows, "ok long, id long, cost long")
    want = {}
    acc = 0
    for ok, rid, c in sorted(rows, key=lambda r: (r[0], r[1])):
        acc += c
        want[rid] = (acc, (acc - c) // 6)
    for d in (df.coalesce(1), df.repartition(7), df.orderBy(F.desc("id"))):
        got = {
            r.id: (r.cum, r.shard)
            for r in shard_by_budget(
                d, "ok", "cost", 6, tiebreak_cols=["id"]
            ).collect()
        }
        assert got == want
