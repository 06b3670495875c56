"""Reshaping: unpivot (melt) and pivot — the reference's signature pair
(SURVEY §2.10 R1/R2).

R1 `melt` (/root/reference/main.py:126-127) turns wide per-state columns
into long (state, separations) rows; R2 `pivot`
(/root/reference/streamlit_app.py:139) builds the category×state heatmap
matrix.

Scale notes:
- `unpivot` is a narrow transformation (Expand node): no shuffle, output
  is |value_cols| × input rows, streamed through codegen.
- `pivot_sum` with an *explicit* value list avoids the extra distinct-scan
  Spark otherwise runs to discover pivot values — at 100 TB that implicit
  scan is a full extra pass over the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "state",
    value_name: str = "separations",
) -> DataFrame:
    """R1 — wide→long, `pd.melt` semantics (/root/reference/main.py:126-127).

    Uses the native `DataFrame.unpivot` (Spark ≥3.4); value columns must
    share a least-common type (cast numerics to double upstream, matching
    the reference's to_numeric coercion at main.py:124).
    """
    return df.unpivot(list(ids), list(values), var_name, value_name)


def pivot_sum(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    measure: str,
) -> DataFrame:
    """R2 — long→wide sum-pivot (/root/reference/streamlit_app.py:138-139).

    `pivot_values` is required: passing the domain explicitly keeps this a
    single groupBy pass (one shuffle) instead of distinct-scan + pivot.
    """
    return (
        df.groupBy(row_key)
        .pivot(pivot_col, list(pivot_values))
        .sum(measure)
    )
