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


def _pd_cell(v):
    """Render a pandas cell the way the driver's value hash sees it:
    int-ness vs float-ness is significant, NaN/None/NaT collapse to None."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        return None if math.isnan(v) else ("float", repr(float(v)))
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_pd_cell(x) for x in v)
    return str(v)


def _pd_norm(df):
    """Column-name-sorted, row-sorted multiset of rendered pandas cells."""
    cols = sorted(df.columns)
    rows = [
        tuple(_pd_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


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

    # Driver-parity leg: the external harness compares PANDAS frames
    # (Spark toPandas vs DuckDB fetchdf), where dtypes leak into the value
    # hash — DuckDB HUGEINT (raw SUM over integers) lands as float64 and
    # renders `150.0` against Spark's int64 `150`. fetchall() above hides
    # that (HUGEINT → Python int), so replay the pandas path too. Note a
    # NULLable int goes float64 on BOTH sides (Arrow/NumPy), which is why
    # e.g. a cube's nullable year column compares fine.
    spdf = sdf.toPandas()
    pdf = con.execute(sql).fetchdf()
    s_pd = _pd_norm(spdf)
    d_pd = _pd_norm(pdf)
    pd_mismatch = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_pd, d_pd)) if a != b
    ]
    assert not pd_mismatch, (
        f"{name}: pandas-path (driver hash) divergence — typically a raw "
        f"integer SUM in the oracle needing CAST(... AS BIGINT); first 3: "
        f"{pd_mismatch[:3]}"
    )
