from healthcare_aihw_etl_pipeline_spark.operators.relational import (
    FIXED_COLS,
    dims_of,
    dynamic_agg,
    filter_in,
    filter_pred_conjunction,
    distinct_domain,
    top_k,
    union_by_name,
)
from healthcare_aihw_etl_pipeline_spark.operators.reshape import pivot_sum, unpivot
from healthcare_aihw_etl_pipeline_spark.operators.windows import (
    argmax_row,
    first_last_pct_change,
    top_k_per_group,
)

__all__ = [
    "FIXED_COLS",
    "dims_of",
    "dynamic_agg",
    "filter_in",
    "filter_pred_conjunction",
    "distinct_domain",
    "top_k",
    "union_by_name",
    "pivot_sum",
    "unpivot",
    "argmax_row",
    "first_last_pct_change",
    "top_k_per_group",
]
