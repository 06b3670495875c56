"""Order-insensitive Spark-vs-DuckDB comparison, mirroring the driver's
row-count + schema + value-hash check (stricter: value-by-value diff with
a readable failure message)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame


def _norm_cell(v):
    """Normalize a cell so Spark and DuckDB renderings compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    """Sort columns by name, then rows — order-insensitive multiset form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(normed, key=repr)


def compare(sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    _, s_norm = _norm_rows(spark_cols, spark_rows)
    _, d_norm = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
