"""healthcare_aihw_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``justinminlee/healthcare-AIHW-ETL-pipeline`` (a single-node pandas ETL +
Streamlit analytics app), re-expressed Spark-first:

- ingest layer: header-sniffing, dynamic-schema wide-sheet ingestion
  (``sources.sheet_ingest``) — the reference's ``parse_sheet`` semantics
  (/root/reference/main.py:72-131) reproduced as driver-side inference +
  distributed DataFrame algebra.
- relational core: every operator in SURVEY.md §2 as a composable function
  over DataFrames (``operators``).
- query surface: named analytics queries with DuckDB-checkable SQL oracles
  (``plans.registry``).
- scale extensions: streaming over event tables (``streaming``), LLM-data
  ops — dedup, similarity search, text analysis, multimodal plumbing
  (``operators.dedup`` / ``operators.similarity`` / ``operators.text`` /
  ``operators.multimodal``).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from healthcare_aihw_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
