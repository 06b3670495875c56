"""Plan-quality tests (SURVEY §4.3): assert the physical plans have the
shape we designed for — pushdown reaching the scan, column pruning,
broadcast dimension joins, TakeOrderedAndProject top-k, and single-shuffle
aggregations. A correct result from a bad plan is a scale bug."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(plan: str) -> int:
    """Count shuffle exchanges (excluding broadcast exchanges). Formatted
    explain prints each node twice (tree + detail); count only the detail
    headers like `(5) Exchange`."""
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {
        name: plan_of(REGISTRY[name].fn(spark, sf_dir))
        for name in [
            "pricing_summary",
            "revenue_by_nation",
            "top10_brands_by_revenue",
            "filter_in_agg",
            "unpivot_lineitem_measures",
            "distinct_event_types",
        ]
    }


def test_filter_pushdown_reaches_scan(plans):
    p = plans["pricing_summary"]
    assert "PushedFilters" in p
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", p), p


def test_column_pruning(plans):
    p = plans["pricing_summary"]
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = m.group(1)
    assert "l_partkey" not in cols and "l_comment" not in cols
    assert "l_quantity" in cols

    p2 = plans["distinct_event_types"]
    m2 = re.search(r"ReadSchema: struct<([^>]*)>", p2)
    assert m2 and m2.group(1).startswith("event_type"), p2


def test_dimension_joins_broadcast(plans):
    p = plans["revenue_by_nation"]
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_topk_is_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["top10_brands_by_revenue"]


def test_single_shuffle_aggregations(plans):
    # filter→groupBy: exactly one shuffle (partial agg before, final after)
    assert shuffle_count(plans["filter_in_agg"]) == 1
    # unpivot is a narrow Expand: still one shuffle total
    assert "Expand" in plans["unpivot_lineitem_measures"]
    assert shuffle_count(plans["unpivot_lineitem_measures"]) == 1


def test_partial_aggregation_present(plans):
    # map-side combine: two HashAggregate nodes around the exchange
    assert len(re.findall(r"HashAggregate", plans["filter_in_agg"])) >= 2
