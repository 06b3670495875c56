from healthcare_aihw_etl_pipeline_spark.functions.scalar import (
    STATE_CODES,
    clean_text,
    norm_state,
    slug,
    try_double,
    try_int,
    year_from_url,
)

__all__ = [
    "STATE_CODES",
    "clean_text",
    "norm_state",
    "slug",
    "try_double",
    "try_int",
    "year_from_url",
]
