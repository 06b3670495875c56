"""Query registry: named Spark queries paired with DuckDB oracle SQL.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI SQL string DuckDB runs
over the same parquet tables. The driver compares row count, schema, and
an order-insensitive value hash — so every computed column is aliased
identically on both sides, and float-sensitive aggregates go through
exact decimal arithmetic (see ``money``) so the two engines agree bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Exact-arithmetic policy: integer-cents. The corpus's monetary/measure
# doubles are 2-decimal values (verified: max |x*100 − round(x*100)| ≈ 1e-9,
# pure FP representation noise), so `round(x*100)::BIGINT` is exact and
# identical in Spark and DuckDB. Long sums are associative → partial
# aggregation order cannot change the result, and long math runs at
# whole-stage-codegen speed (~3× faster than decimal on the hot path).
# Final dollar outputs divide the exact integer by 10^scale as DOUBLE:
# the integer is exact in double below 2^53 ≈ 9e15 (comfortable through
# sf10; beyond that, switch the output to decimal), and one IEEE divide
# is bit-deterministic across engines.
#
# Downscaling decimal casts are banned outright: Spark rounds HALF_UP,
# DuckDB half-to-even → off-by-one-ulp mismatches on exact half-ties.


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-point double column.

    floor(x*10^s + 0.5) instead of round(x*10^s): Spark's Round on
    doubles allocates a java BigDecimal PER ROW (2.6× slower on a 600k-row
    4-column aggregate, measured), while floor stays a primitive inside
    whole-stage codegen. Equal to round() for every value whose scaled
    form is not exactly *.5 — which cannot occur for the fixed-point
    inputs this helper is for (x*10^s lands within float error of an
    integer, never near .5); per-row equality verified across every money
    column at sf0.01/sf0.1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("long")


def sql_cents(col: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`cents`."""
    return f"CAST(round({col} * {10**scale}) AS BIGINT)"


def dollars(col: Column, name: str, scale: int = 2) -> Column:
    """Exact-integer aggregate → dollar-valued double output."""
    return (col.cast("double") / F.lit(float(10**scale))).alias(name)


def sql_dollars(expr: str, name: str, scale: int = 2) -> str:
    return f'CAST({expr} AS DOUBLE) / {float(10 ** scale)} AS "{name}"'


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    # The uncached constructor (fn is the plan-cached wrapper). Use this
    # when a test or measurement specifically needs a fresh build.
    build: Callable[[SparkSession, str], DataFrame] | None = None


REGISTRY: dict[str, Query] = {}

# Prepared-statement plan cache: registry queries are pure functions of
# (session, sf_dir), so the constructed DataFrame — an immutable logical
# plan plus its once-materialized physical plan — is reusable across
# calls. Python-side plan construction costs 25–160 ms per query in
# py4j round-trips plus ~10–60 ms of Catalyst analysis (measured, 12
# headline queries: 0.81 s + 0.22 s per suite pass), none of which is
# data-proportional; every serious engine amortizes it (prepared
# statements / plan caches). Keyed by applicationId so a new session
# never sees another session's plans; entries are logical plans only —
# no rows are pinned.
#
# IMMUTABILITY CONTRACT: a cached plan pins the parquet FILE LISTING at
# construction time, so the cache assumes the data under `sf_dir` does
# not change for the session's lifetime (true for the read-only testdata
# dirs this registry serves). Whoever rewrites an input — e.g. the
# `_events_typed` derived-table rebuild in reference_queries.py — must
# call :func:`invalidate` for that sf_dir, or readers keep resolving the
# stale snapshot. Size is bounded in practice by
# |registered queries| × |sf_dirs| (~a few hundred logical plans, no
# pinned rows); `invalidate()` is also the full-reset hook for tests.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def invalidate(name: str | None = None, sf_dir: str | None = None) -> int:
    """Drop cached plans matching `name` and/or `sf_dir` (None = any).

    Returns the number of entries dropped. Call after mutating data
    under an sf_dir (derived-table rebuild, test fixture rewrite) so
    subsequent registry calls re-resolve the file listing."""
    keys = [
        k
        for k in _PLAN_CACHE
        if (name is None or k[1] == name) and (sf_dir is None or k[2] == sf_dir)
    ]
    for k in keys:
        del _PLAN_CACHE[k]
    return len(keys)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry (with a plan cache)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        @functools.wraps(fn)
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (spark.sparkContext.applicationId, name, sf_dir)
            df = _PLAN_CACHE.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[key] = df
            return df

        REGISTRY[name] = Query(
            name=name,
            fn=cached,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            build=fn,
        )
        return fn

    return deco
