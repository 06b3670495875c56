"""Re-identification risk audit: k-anonymity / l-diversity over
quasi-identifier combinations.

A training-data release (or any analytics extract) leaks identity when
a combination of quasi-identifiers — attributes individually harmless,
jointly near-unique — isolates a row. The standard audit is
k-anonymity (every row shares its QI tuple with >= k-1 others) plus
l-diversity (within a QI group, the *sensitive* attribute takes >= l
distinct values, so group membership doesn't reveal it). This module
computes both in two shuffle-free-beyond-the-groupBy passes:

1. ``group_anonymity``: one groupBy over the QI columns producing per-
   group ``k`` (size) and ``l`` (distinct sensitive values). Map-side
   partial aggregation applies; the output's cardinality is the QI
   domain, orders of magnitude below the row count.
2. ``anonymity_bands``: a second aggregation over those GROUP rows into
   fixed risk bands (k=1 unique, 2-4 small, 5-19, 20+), each with
   group/row counts and worst-case k and l. The band table is O(1).

At 100 TB the only large shuffle is pass 1's groupBy on the QI key —
exactly the aggregation Spark is built for; everything downstream
operates on the (small) group relation. No windows, no collect.

Reference scope note: the reference (/root/reference/main.py) has no
privacy surface; this is part of the LLM-training-pipeline family
(release audits before publishing corpus extracts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Risk bands over group size k: (inclusive lower bound, label). The
# lower bound doubles as the deterministic sort key of the band table.
BANDS: tuple[tuple[int, str], ...] = (
    (1, "k=1 unique"),
    (2, "2<=k<5"),
    (5, "5<=k<20"),
    (20, "k>=20"),
)


def band_of(k: Column) -> Column:
    """Map a group-size column to its band lower bound (see BANDS)."""
    expr = None
    for (lo, _), (nxt, _) in zip(BANDS, BANDS[1:]):
        expr = (
            F.when(k < F.lit(nxt), F.lit(lo))
            if expr is None
            else expr.when(k < F.lit(nxt), F.lit(lo))
        )
    return expr.otherwise(F.lit(BANDS[-1][0]))


def sql_band_of(k: str) -> str:
    """DuckDB twin of :func:`band_of`."""
    cases = []
    for (lo, _), (nxt, _) in zip(BANDS, BANDS[1:]):
        cases.append(f"WHEN {k} < {nxt} THEN {lo}")
    return "CASE " + " ".join(cases) + f" ELSE {BANDS[-1][0]} END"


def group_anonymity(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Per-QI-group anonymity stats: the QI columns plus

    - ``k``: group size (the anonymity parameter of every row in it),
    - ``l``: count of distinct sensitive values in the group.

    One hash aggregation on the QI key; count(distinct) expands to the
    standard two-phase expand/aggregate Spark plan, still a single
    logical pass over the input.
    """
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(F.col(sensitive_col)).alias("l"),
    )


def anonymity_bands(groups: DataFrame) -> DataFrame:
    """Collapse a :func:`group_anonymity` relation into the fixed risk
    bands: per band, how many QI groups and rows fall in it and the
    worst (smallest) k and l observed. Ordered by band lower bound —
    a total order, so the output is deterministic."""
    labels = F.create_map(
        *[x for lo, lab in BANDS for x in (F.lit(lo), F.lit(lab))]
    )
    return (
        groups.select(
            band_of(F.col("k")).alias("band_lo"), "k", "l"
        )
        .groupBy("band_lo")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.min("l").alias("min_l"),
        )
        .withColumn("band", labels[F.col("band_lo")])
        .select(
            "band_lo", "band", "n_groups", "n_rows", "min_k", "max_k",
            "min_l",
        )
        .orderBy("band_lo")
    )


# ---------------------------------------------------------------------------
# Differential-privacy release: seeded Laplace noise
#
# Laplace(sensitivity/epsilon) noise via the inverse CDF of a
# DETERMINISTIC md5-uniform draw per release cell. Seeded noise is the
# reproducible-pipeline form (same release twice = same noise, so a
# re-run cannot be averaged against itself to denoise); a production
# one-shot release would swap the md5 draw for true randomness — the
# accounting and the inverse-CDF algebra are unchanged. Every step is
# an exact or correctly-rounded IEEE op on identical expressions, so
# the noise replays bit-for-bit in any engine.

DP_Q = 1_000_000  # noise quantum: micro-counts


def laplace_noise_q(seed_col, epsilon: float, sensitivity: float = 1.0):
    """Quantized Laplace draw (units of 1/DP_Q): inverse CDF
    -b*sign(u-1/2)*ln(1-2|u-1/2|) with b = sensitivity/epsilon and u
    the md5-uniform of the seed column. The ln argument is floored at
    1e-15 to keep the 2^-52 edge draw finite."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.sampling import (
        md5_uniform,
    )

    b = float(sensitivity) / float(epsilon)
    c = md5_uniform(seed_col) - F.lit(0.5)
    mag = F.greatest(F.lit(1e-15), F.lit(1.0) - F.lit(2.0) * F.abs(c))
    noise = F.lit(-b) * F.signum(c) * F.log(mag)
    return F.floor(noise * F.lit(DP_Q) + F.lit(0.5)).cast("long")


def sql_laplace_noise_q(seed_expr: str, epsilon: float,
                        sensitivity: float = 1.0) -> str:
    """DuckDB twin of :func:`laplace_noise_q`."""
    from healthcare_aihw_etl_pipeline_spark.operators.sampling import (
        sql_md5_uniform,
    )

    b = float(sensitivity) / float(epsilon)
    u = sql_md5_uniform(seed_expr)
    c = f"({u} - 0.5)"
    mag = f"greatest(1e-15, 1.0 - 2.0 * abs({c}))"
    return (
        f"CAST(floor({-b} * sign({c}) * ln({mag}) * {DP_Q} + 0.5) "
        "AS BIGINT)"
    )
