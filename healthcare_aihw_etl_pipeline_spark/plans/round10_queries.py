"""Round-10 query families: audio PCM decode features (the WAV leg of
the multimodal decode path, closing the audio codec seam with the stdlib
`wave` module).

Same contract as every plans module: queries pair idiomatic PySpark with
a DuckDB oracle whose arithmetic is bit-identical — exact integer
moments, quantization before any cross-row sum, correctly-rounded IEEE
ops on identical expressions. Reference lineage: extends the reference's
binary-ingest path (/root/reference/main.py downloads xlsx bytes over
HTTP) to the opaque-binary media columns a training-data pipeline
carries.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_aihw_etl_pipeline_spark.plans.registry import register
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

# Deterministic PCM synthesis shared by the Spark encoder and the DuckDB
# oracle: clip length and every int16 sample are pure integer functions
# of doc_id, so the oracle replays the features without ever seeing the
# WAV bytes — the bytes themselves are what the Spark side round-trips
# through a REAL RIFF/WAVE container and the stdlib `wave` decoder.
_AUD_RATE = 8000
_AUD_BASE = 160  # samples
_AUD_MOD = 96
_AUD_A = 7919
_AUD_B = 104729


def _pcm_sample(doc_id: int, i: int) -> int:
    return ((doc_id * _AUD_A + i * _AUD_B) % 65536) - 32768


@register(
    "audio_pcm_features",
    oracle=f"""
    WITH clips AS (
      SELECT doc_id, source, {_AUD_BASE} + (doc_id % {_AUD_MOD}) AS ns
      FROM documents
    ),
    samples AS (
      SELECT c.doc_id, c.source, c.ns,
             ((c.doc_id * {_AUD_A} + g.i * {_AUD_B}) % 65536) - 32768 AS s
      FROM clips c, unnest(generate_series(0, c.ns - 1)) AS g(i)
    ),
    feats AS (
      SELECT doc_id, source, ns,
             MAX(abs(s)) AS peak,
             SUM(s * s) AS sumsq
      FROM samples GROUP BY doc_id, source, ns
    )
    SELECT source,
           COUNT(*) AS n_clips,
           CAST(SUM(ns) AS BIGINT) AS total_samples,
           CAST(SUM(ns * 1000 // {_AUD_RATE}) AS BIGINT)
             AS total_duration_ms,
           CAST(MAX(peak) AS BIGINT) AS max_peak,
           CAST(SUM(CAST(floor(
             sqrt(CAST(sumsq AS DOUBLE) / ns) * 1000 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_rms_q
    FROM feats GROUP BY source ORDER BY source
    """,
    doc="Audio PCM decode features — the WAV leg of the multimodal "
    "decode path, end-to-end through a REAL container format: each "
    "document synthesizes a deterministic int16 PCM clip, is packed "
    "into a hand-rolled RIFF/WAVE blob (struct, independent of the "
    "decoder), and flows through operators/multimodal.audio_features — "
    "an Arrow-batched mapInPandas stage decoding with the stdlib "
    "`wave` module into exact integer features (duration_ms, peak, "
    "sum-of-squares, RMS quantized to thousandths BEFORE the per-source "
    "sum). The DuckDB oracle replays the features from the same integer "
    "synthesis without touching WAV bytes, so a decode bug anywhere in "
    "the container round-trip breaks the hash. At 100 TB the envelope "
    "math matches decode_media: decoded-PCM-per-task is the partition "
    "sizing constraint, and every cross-row aggregate is an exact "
    "integer sum (map-side combinable, order-free).",
)
def audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    enc_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("source", T.StringType(), True),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, srcs, blobs = [], [], []
            for did, src in zip(pdf["doc_id"], pdf["source"]):
                ns = _AUD_BASE + int(did) % _AUD_MOD
                samples = [_pcm_sample(int(did), i) for i in range(ns)]
                ids.append(int(did))
                srcs.append(src)
                blobs.append(encode_wav_pcm16(samples, _AUD_RATE))
            yield pd.DataFrame(
                {"media_id": ids, "source": srcs, "content": blobs}
            )

    media = docs.mapInPandas(encode, schema=enc_schema)
    feats = audio_features(media)
    # source lookup re-reads the (cheap) parquet scan, not the encode
    # stage — joining back to `media` would run the encoder twice.
    return (
        feats.join(docs.withColumnRenamed("doc_id", "media_id"), "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_samples").alias("total_samples"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.max("peak").alias("max_peak"),
            F.sum("rms_q").alias("sum_rms_q"),
        )
        .orderBy("source")
    )
