"""Named query surface. Importing this package registers all queries."""

from healthcare_aihw_etl_pipeline_spark.plans.registry import REGISTRY, Query, register

# Import for registration side effects.
from healthcare_aihw_etl_pipeline_spark.plans import reference_queries  # noqa: F401,E402
from healthcare_aihw_etl_pipeline_spark.plans import llm_queries  # noqa: F401,E402
from healthcare_aihw_etl_pipeline_spark.plans import ingest_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "register"]
