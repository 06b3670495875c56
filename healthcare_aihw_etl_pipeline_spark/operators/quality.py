"""Declarative data-quality audit: Deequ-style expectation suites
computed in one aggregation pass.

A 100 TB ingest needs its validation to cost ONE scan, not one scan per
check. Every check here compiles to an aggregate expression over the
same groupBy-less agg (map-side partials, single scalar row out), then
the scalar row is unpivoted into the (check_name, metric, passed) report via
a literal stack — no second pass, no driver-side loop. Referential
checks (orphan counts against another table) are the one exception:
they need a join, and are unioned in as their own tiny aggregate.

Metrics are exact-integer counts divided once at the end (a single IEEE
divide is bit-deterministic across engines), so audit reports are
hash-verifiable against a SQL oracle — the same discipline as the
money arithmetic in plans/registry.py.

Reference scope note: the reference's validity checks are per-sheet
shape sniffs at ingest (/root/reference/main.py:69-87); this module
generalizes them into a declarative post-load audit surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: `metric` is an aggregate Column producing a
    DOUBLE in [0, 1] or a count-like value; `passed` is a boolean
    aggregate over the same pass. `name` keys the report row."""

    name: str
    metric: Column
    passed: Column


def completeness(col: str) -> Check:
    """Fraction of rows with a non-null value; passes at 1.0."""
    n_ok = F.sum(F.col(col).isNotNull().cast("long"))
    n = F.count(F.lit(1))
    frac = n_ok.cast("double") / n.cast("double")
    return Check(f"completeness({col})", frac, n_ok == n)


def uniqueness(*cols: str) -> Check:
    """Fraction of rows whose key tuple is globally unique == distinct
    count / row count; passes when every tuple is distinct. Counts are
    exact (count_distinct shuffles on the key with partial aggregation)."""
    n_distinct = F.count_distinct(*[F.col(c) for c in cols])
    n = F.count(F.lit(1))
    frac = n_distinct.cast("double") / n.cast("double")
    return Check(
        "uniqueness(" + ",".join(cols) + ")", frac, n_distinct == n
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    """Count of values outside [lo, hi] (nulls don't violate); passes
    at zero violations."""
    bad = F.sum(
        (
            F.col(col).isNotNull()
            & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))
        ).cast("long")
    )
    return Check(
        f"in_range({col},{lo},{hi})", bad.cast("double"), bad == F.lit(0)
    )


def accepted_values(col: str, values: list[str]) -> Check:
    """Count of non-null values outside the accepted list; passes at 0."""
    bad = F.sum(
        (F.col(col).isNotNull() & ~F.col(col).isin(values)).cast("long")
    )
    return Check(
        f"accepted_values({col})", bad.cast("double"), bad == F.lit(0)
    )


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run all checks in ONE aggregation over `df`; returns
    (check_name, metric, passed) — one row per check, deterministic order
    by construction (the stack literal fixes it; callers normally sort
    by check name for oracle comparison)."""
    if not checks:
        raise ValueError("audit needs at least one check")
    agg_cols = []
    for i, c in enumerate(checks):
        agg_cols.append(c.metric.alias(f"_m{i}"))
        agg_cols.append(c.passed.alias(f"_p{i}"))
    row = df.agg(*agg_cols)
    stack_args: list[Column] = []
    for i, c in enumerate(checks):
        stack_args.extend(
            [F.lit(c.name), F.col(f"_m{i}"), F.col(f"_p{i}")]
        )
    return row.select(
        F.stack(
            F.lit(len(checks)), *stack_args
        ).alias("check_name", "metric", "passed")
    )


def referential_orphans(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, name: str
) -> DataFrame:
    """(check_name, metric, passed) single-row report counting fact rows with
    no matching dimension row (LEFT ANTI join — shuffle-hash or
    broadcast per AQE; at scale the anti join shuffles once on the key).
    Metric is the orphan count as double; passes at zero."""
    orphans = fact.join(
        dim, fact[fact_key] == dim[dim_key], "left_anti"
    ).agg(F.count(F.lit(1)).alias("_n"))
    return orphans.select(
        F.lit(name).alias("check_name"),
        F.col("_n").cast("double").alias("metric"),
        (F.col("_n") == 0).alias("passed"),
    )
