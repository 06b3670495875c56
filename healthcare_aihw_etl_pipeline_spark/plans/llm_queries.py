"""LLM-data-pipeline queries over `documents` / `embeddings` (driver
mandate, BASELINE.json north_star): dedup, text analysis, similarity.

SQL-expressible variants carry DuckDB oracles; approximate ops (MinHash,
SimHash, LSH) live in ``operators.dedup`` / ``operators.similarity`` and
are checked by property tests plus weaker rows-only entries here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans.registry import dollars, register
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table


@register(
    "dedup_exact_stats",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique_texts,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
    FROM documents
    """,
    doc="Exact dedup census: hash-groupBy over md5(text). The canonical "
    "first pass of a training-data pipeline; at 100 TB this is one shuffle "
    "on a 16-byte key with map-side partial distinct.",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
    )


@register(
    "dedup_prefix_keepers",
    oracle="""
    SELECT md5(array_to_string(regexp_split_to_array(TRIM(text), '\\s+')[1:10], ' ')) AS prefix_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
    doc="Fingerprint dedup keep-first policy: documents colliding on the "
    "hash of their first 10 tokens; per group, the surviving doc_id (min) "
    "and multiplicity. Same shuffle shape as exact dedup but catches "
    "boilerplate-prefix near-dups.",
)
def dedup_prefix_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 10))
    return (
        docs.groupBy(F.md5(prefix).alias("prefix_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(len(regexp_split_to_array(TRIM(text), '\\s+'))) AS total_tokens,
           SUM(LENGTH(text)) AS total_chars,
           MAX(LENGTH(text)) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Text analysis: whitespace token counting + length stats per "
    "language (all-exact integer aggregates; Catalyst-only expressions).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(round(round(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) * 10000) AS BIGINT))
                AS DOUBLE) / 10000.0 AS sum_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Array-column math surface: per-vector L2 norm via higher-order "
    "functions (F.aggregate/transform — JVM-side, no UDF), rounded then "
    "exact-summed per label.",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    # round to 4dp (bit-identical doubles on both engines), then exact
    # integer-1e-4 units for the associative sum (see plans.registry).
    norm_e4 = F.round(F.round(F.sqrt(sq_sum), 4) * 10000).cast("long")
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.sum(norm_e4).alias("sn"))
        .select("label", "n_vectors", dollars(F.col("sn"), "sum_norm", 4))
    )
