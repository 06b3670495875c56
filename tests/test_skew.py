"""salted_join: result equivalence with a plain join (inner + left,
single and composite keys, unmatched rows, duplicate right keys) and the
actual de-skew property — a hot key's rows really scatter across salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 5,000 rows of one hot key + a uniform tail, with a value column so
    # row identity (hence the salt hash) varies within the hot key.
    left = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 50, 2)], "k long, name string"
    )
    return left, right


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_plain_join(skewed, how):
    left, right = skewed
    plain = left.join(right, "k", how)
    salted = salted_join(left, right, "k", salts=8, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert rows(salted.select(*plain.columns)) == rows(plain)


def test_composite_key_and_dup_right_rows(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11), (2, "b", 12), (3, "c", 13)],
        "k1 long, k2 string, v long",
    )
    # duplicate (k1, k2) on the right must fan out in BOTH forms.
    right = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (2, "b", "z")], "k1 long, k2 string, tag string"
    )
    plain = left.join(right, ["k1", "k2"], "left")
    salted = salted_join(left, right, ["k1", "k2"], salts=4, how="left")
    assert rows(salted.select(*plain.columns)) == rows(plain)


def test_hot_key_actually_scatters(skewed):
    left, _ = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_salts = (
        left.where(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_salts == 8  # 5,000 distinct rows cover all 8 sub-keys


def test_rejects_outer_forms(skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")
