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
    # Optional LARGE-SCALE oracle: a second, independently-written
    # DuckDB formulation whose single-node cost profile stays feasible
    # at sf10 where the primary oracle cannot finish (e.g. the primary
    # deliberately keeps an uncollapsed / quadratic shape for
    # independence at sf0.01). The driver contract always grades the
    # PRIMARY oracle; the sf10 window replay may substitute this one
    # (SIM_ALT_ORACLE=1 in scripts/driver_sim.py) so the replay can
    # hash-check names that were previously environment-bound.
    alt_oracle: str | None = None


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
# STALENESS GUARD: a cached plan pins the parquet FILE LISTING at
# construction time. Rather than trusting every writer to remember
# :func:`invalidate` (the footgun: a query that writes-then-reads inside
# one registered fn silently serves a stale snapshot), each cache entry
# carries an mtime TOKEN — the (name, mtime_ns) listing of `sf_dir`'s
# immediate children plus any extra paths registered via
# :func:`watch_path` (derived-table roots living outside sf_dir, e.g.
# the `_events_typed` materialization under tempdir). A lookup whose
# current token differs rebuilds the plan. One scandir + a few stats per
# call (~tens of µs) buys back 25–160 ms of py4j/Catalyst work per
# query, so the economics are unchanged. `invalidate()` remains the
# explicit hook (tests, bulk reset). Size is bounded in practice by
# |registered queries| × |sf_dirs| (~a few hundred logical plans, no
# pinned rows).
_PLAN_CACHE: dict[tuple[str, str, str], tuple[tuple, DataFrame]] = {}

# Extra filesystem paths (per sf_dir) whose mtime feeds the staleness
# token: derived-table writers register their output's _SUCCESS marker
# (or root dir) here so a rebuild is visible to the guard even though it
# happens outside sf_dir.
_WATCHED: dict[str, set[str]] = {}


def watch_path(sf_dir: str, path: str) -> None:
    """Fold `path`'s mtime into the plan-cache staleness token for
    `sf_dir`. Call from any query that materializes a derived table
    outside sf_dir; idempotent."""
    _WATCHED.setdefault(sf_dir, set()).add(path)


def _state_token(sf_dir: str) -> tuple:
    """Cheap fingerprint of the inputs cached plans resolve against:
    (name, mtime_ns) of sf_dir's immediate children + watched paths.
    A Spark overwrite of any child (or a watched derived root) bumps an
    mtime, so write-then-read within a session can't serve stale plans."""
    import os

    entries: list[tuple[str, int]] = []
    try:
        with os.scandir(sf_dir) as it:
            for e in it:
                try:
                    entries.append((e.name, e.stat().st_mtime_ns))
                except OSError:
                    entries.append((e.name, -1))
    except OSError:
        entries.append(("<missing-sf-dir>", -1))
    for p in _WATCHED.get(sf_dir, ()):
        try:
            entries.append((p, os.stat(p).st_mtime_ns))
        except OSError:
            entries.append((p, -1))
    return tuple(sorted(entries))


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


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    alt_oracle: str | None = None,
):
    """Decorator: add a query to the registry (with a plan cache)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        @functools.wraps(fn)
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (spark.sparkContext.applicationId, name, sf_dir)
            hit = _PLAN_CACHE.get(key)
            if hit is not None and hit[0] == _state_token(sf_dir):
                return hit[1]
            df = fn(spark, sf_dir)
            # Token taken AFTER construction: a first call that also
            # materializes a derived table (bumping a watched mtime)
            # records the post-build state, so the next call hits.
            _PLAN_CACHE[key] = (_state_token(sf_dir), df)
            return df

        REGISTRY[name] = Query(
            name=name,
            fn=cached,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            build=fn,
            alt_oracle=alt_oracle,
        )
        return fn

    return deco
