"""Z-order layout operator tests: the written files must bound BOTH
clustered dimensions (the property file/row-group skipping relies on),
and the Z-value must match its pure-SQL twin."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.operators.layout import (
    bucketize,
    sql_zvalue,
    write_zordered,
    zvalue,
)


def test_zvalue_matches_sql_twin(spark):
    """Spark shift/mask zvalue ≡ the div/mod SQL replay, exhaustively
    over the full 8-bit × 8-bit domain."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("xb"), F.expr("id DIV 256").alias("yb")
    )
    # DuckDB-style // and % exist in Spark SQL as DIV and %.
    sql_form = sql_zvalue("xb", "yb", 8).replace("//", "DIV")
    n_bad = (
        grid.select(
            zvalue(F.col("xb"), F.col("yb"), 8).alias("a"),
            F.expr(f"CAST({sql_form} AS BIGINT)").alias("b"),
        )
        .where("a <> b")
        .count()
    )
    assert n_bad == 0
    # Z-value is a bijection on the 16-bit domain
    assert grid.select(zvalue(F.col("xb"), F.col("yb"), 8)).distinct().count() == 65536


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    """64k rows over a 256x256 (x, y) grid written to 16 z-ordered
    files: every file's min/max span on EACH dimension must be far
    below the full domain (a date-sorted layout would leave one
    dimension spanning ~the whole domain in every file)."""
    df = spark.range(65536).select(
        (F.col("id") % 256).alias("x"), F.expr("id DIV 256").alias("y")
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, F.col("x"), F.col("y"), bits=8, prefix_bits=4)
    files = glob.glob(f"{path}/_zcell=*/part-*.parquet")
    assert len(files) == 16
    stats = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(stats) == 16
    for r in stats:
        # 16 files = 4 Z-prefix bits = y7,x7,y6,x6 fixed per cell →
        # every file covers exactly one 64x64 tile of the 256x256
        # domain (prefix-aligned cuts; quantile cuts would straddle
        # Morton discontinuities and span the full domain).
        assert r.xs <= 63, r
        assert r.ys <= 63, r
    # uniform grid → cell-aligned files are exactly even
    sizes = sorted(r.n for r in stats)
    assert sizes[0] == sizes[-1] == 65536 // 16


def test_bucketize_monotone_and_bounded(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 997).alias("v"))
    out = df.select(
        "v", bucketize(F.col("v"), 0, 996, 4).alias("b")
    ).collect()
    for r in out:
        assert 0 <= r.b < 16
    by_v = sorted(out, key=lambda r: r.v)
    assert all(a.b <= b.b for a, b in zip(by_v, by_v[1:]))


def test_write_zordered_rejects_bad_args(spark, tmp_path):
    """prefix_bits > 2*bits would shiftright by a negative amount and
    collapse every row into one cell; empty input yields NULL bounds.
    Both must raise instead of silently mis-laying-out the table."""
    import pytest

    df = spark.range(16).select(
        F.col("id").alias("x"), (15 - F.col("id")).alias("y")
    )
    with pytest.raises(ValueError, match="prefix_bits"):
        write_zordered(
            df, str(tmp_path / "bad"), F.col("x"), F.col("y"), bits=2, prefix_bits=5
        )
    with pytest.raises(ValueError, match="empty"):
        write_zordered(
            df.where("x < 0"), str(tmp_path / "empty"), F.col("x"), F.col("y")
        )
