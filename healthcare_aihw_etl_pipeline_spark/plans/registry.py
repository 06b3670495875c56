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

# Exact-arithmetic policy: cast doubles to decimal before SUM so Spark and
# DuckDB produce identical values regardless of partial-aggregation order.
# decimal(18,6) input → products at scale 12 → sums at decimal(38,12) in
# both engines. Results are NOT rescaled afterwards: a downscaling cast
# (e.g. to scale 2) hits exact half-ties, where Spark rounds HALF_UP but
# DuckDB rounds half-to-even — keeping the natural sum scale stays exact
# and bit-identical on both sides.
DEC_IN = "decimal(18,6)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_IN)


def dec_out(col: Column, name: str) -> Column:
    """Alias a decimal aggregate without rescaling (see note above)."""
    return col.alias(name)


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
