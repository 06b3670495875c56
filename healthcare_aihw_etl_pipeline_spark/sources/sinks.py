"""Sinks and external-table IO (SURVEY §2.1 S6/S7/S8).

The reference persists with full-replace JDBC writes in multi-row INSERT
batches (`df.to_sql(..., if_exists="replace", method="multi")`,
/root/reference/main.py:158,165) and reads back with `SELECT *`
(/root/reference/streamlit_app.py:30,33). Spark-first equivalents:

- canonical storage is partitioned parquet (`write_table`/`read_table`) —
  overwrite mode reproduces the full-replace contract; `partitionBy`
  gives the partition pruning the dashboard filter path needs (every
  widget filter includes `year`, /root/reference/streamlit_app.py:57-63).
- JDBC in/out stay available as thin wrappers (`read_jdbc`/`write_jdbc`)
  with the batching knob mapped to Spark's `batchsize`; untestable in
  this container (no database), parameters mirror the reference's
  semantics exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """S7 — full-replace (or append) parquet table write."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """S6 — table scan (`SELECT *` equivalent); lazy, pruned by Catalyst."""
    return spark.read.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    batchsize: int = 1000,
    options: dict[str, str] | None = None,
) -> None:
    """S7 — JDBC sink: overwrite == the reference's if_exists="replace";
    `batchsize` == its multi-row INSERT batching (method="multi")."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    *,
    table: str | None = None,
    query: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S6 — JDBC scan by table name or pushdown query."""
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    reader = reader.option("dbtable", table) if table else reader.option("query", query)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
