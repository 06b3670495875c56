"""Registry-wide physical-plan lint: structural anti-pattern guarantees
over EVERY registered query, not just the hand-pinned ones.

- No CartesianProduct anywhere (scalar broadcasts compile to
  BroadcastNestedLoopJoin over a 1-row aggregate, which is allowed).
- No BatchEvalPython (row-at-a-time Python UDF) anywhere — the engine's
  zero-row-Python contract (SURVEY §2.12).
- ArrowEvalPython (vectorized pandas UDFs) only in the explicit
  allowlist of A/B-justified operators.

Plans are built at sf0.001 (construction only for most queries; the few
that execute a probe or a txlog round-trip during construction stay
cheap at that scale).
"""

from __future__ import annotations

import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"

# Vectorized-Python operators that measured faster than the expression
# form (Arrow-batched; each documented at its definition site).
ARROW_ALLOWED = {
    "minhash_dup_clusters",
    "ann_lsh_top10",
    "lsh_bucket_histogram",
    "embedding_near_dup_top20",
    "ivf_cosine_top10",
    "multimodal_byte_profile",
}


def _plan(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@pytest.fixture(scope="module")
def all_plans(spark):
    plans = {}
    for name, q in REGISTRY.items():
        try:
            plans[name] = _plan(q.fn(spark, SF_SMALL))
        except Exception as e:  # pragma: no cover - lint must name the query
            pytest.fail(f"{name}: plan construction failed: {e}")
    return plans


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_no_row_python_udf_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_arrow_udfs_only_where_justified(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "ArrowEvalPython" in p and n not in ARROW_ALLOWED
    ]
    assert not offenders, offenders
