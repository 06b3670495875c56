"""Ingest-path queries: the reference's ETL pipeline end-to-end
(SURVEY §3.1), from raw wide sheets to the clean aggregated fact table,
oracle-checked against a DuckDB replay of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans.registry import register
from healthcare_aihw_etl_pipeline_spark.sources import fixtures
from healthcare_aihw_etl_pipeline_spark.sources.sheet_ingest import (
    clean_aggregate,
    compile_sheets,
)


@register(
    "ingest_clean_admissions",
    oracle=fixtures.ingest_oracle_sql(),
    doc="The full reference ETL (/root/reference/main.py:72-165) on "
    "reference-shaped fixture sheets: header sniff → column-role inference "
    "→ clean/coerce → unpivot → heterogeneous union → fill-then-group "
    "clean aggregation. The oracle replays the data semantics in DuckDB "
    "from the same fixture constants (header inference is unit-tested — "
    "it is metadata, not data).",
)
def ingest_clean_admissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixture-driven: sf_dir is unused — the input is the raw sheet corpus.
    tidy = compile_sheets(spark, fixtures.SHEETS)
    clean = clean_aggregate(tidy)
    return clean.select(
        "year",
        "state",
        "category",
        "principal_diagnosis",
        "care_type",
        "hospital_type",
        F.col("separations"),
    )
