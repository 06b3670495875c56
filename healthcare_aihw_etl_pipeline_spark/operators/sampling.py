"""Weighted sampling without replacement at corpus scale.

Distributed weighted sampling is a core curation primitive (sample
training documents proportional to quality score, orders proportional
to value, ...). The classic single-pass algorithm is Efraimidis &
Spirakis A-ES: draw u_i ~ Uniform(0,1] per item, rank by key
u_i^(1/w_i), keep the top k — provably equivalent to sequential
weighted sampling without replacement. In Spark that is ONE scan plus a
TakeOrderedAndProject (per-partition top-k, merge on the driver-side
reduce): no global sort, no shuffle of the full data.

Determinism/portability: u_i is not a RNG draw but an md5-derived
uniform — (first 13 hex chars as integer + 1) / 2^52, a value in
(0, 1] that is EXACT in double (the divisor is a power of two) and
identical in any engine with md5 (DuckDB: '0x'||hex cast; Spark:
conv(hex,16,10)). Ranking uses ln(u)/w, monotone-equivalent to
u^(1/w) for positive weights and cheaper (one libm call, no pow). The
sampled SET is therefore reproducible across engines, partitionings,
and reruns — the property every dataset-lineage audit wants — and the
emitted u column is bit-exact for hash verification.

Reference scope note: no sampling surface exists in the reference
(/root/reference/main.py); part of the LLM-pipeline operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U_DIVISOR = float(1 << 52)  # 13 hex chars = 52 bits


def md5_uniform(id_col: Column | str) -> Column:
    """Deterministic uniform in (0, 1] from an id column: exact-double
    (h+1)/2^52 where h is the first 52 bits of md5(id as string)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    return (h + F.lit(1)).cast("double") / F.lit(_U_DIVISOR)


def sql_md5_uniform(id_expr: str) -> str:
    """DuckDB twin of :func:`md5_uniform`."""
    return (
        f"(CAST(CAST('0x' || substring(md5(CAST({id_expr} AS VARCHAR)),"
        f" 1, 13) AS BIGINT) + 1 AS DOUBLE) / {_U_DIVISOR})"
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
) -> DataFrame:
    """A-ES weighted sample of k items: rank by ln(u)/w descending
    (u = md5_uniform(id), w > 0 enforced by filter), tie-broken by id
    so the result is a total order. Returns the input columns plus
    `u` (exact double) and the sampled rank order.

    The rank key ln(u)/w is ≤ 0 and larger-is-better; items with
    non-positive weight are excluded (A-ES requires w > 0).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wd = w.cast("double")
    u = md5_uniform(id_col)
    keyed = df.where(wd > 0).withColumn("u", u).withColumn(
        "_key", F.log(F.col("u")) / wd
    )
    return (
        keyed.orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )
