from healthcare_aihw_etl_pipeline_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
