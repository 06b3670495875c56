#!/usr/bin/env python
"""Round-17 optimization measurement harness (guide §1).

Same methodology as round 16 (noop sink, min-of-reps, labelled jobs,
plan dumps + shape stats) plus a per-query SPARK JOB COUNT via job
groups — the r16 wins were job-count wins (17 jobs -> 1) that plan
dumps cannot show, so the job count is first-class evidence this round.

For each named query: capture .explain("formatted") to
plans/r17/<name>_<tag>.txt and time the computation through the noop
sink (min-of-reps) so the sink cost never pollutes the number. Jobs are
labelled via setJobDescription. Plan-shape stats (Exchange count, join
strategies, Python-boundary nodes) are summarized to stdout/JSON.

Usage:
  python scripts/opt_r17_measure.py --tag before --sf /root/testdata/sf0.1 \
      --ops revenue_by_nation,json_props_agg [--reps 3] [--no-time]
  python scripts/opt_r17_measure.py --tag before --sf /tmp/sfbench/sf1 --all-headline
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aihw_etl_pipeline_spark import get_spark  # noqa: E402
from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)

HEADLINE = [
    "revenue_by_nation", "pricing_summary", "top10_brands_by_revenue",
    "filter_in_agg", "pivot_priority_status", "unpivot_lineitem_measures",
    "top3_orders_per_priority", "events_hourly_window", "json_props_agg",
    "events_typed_agg", "dedup_prefix_keepers", "text_token_stats",
    "embedding_norms",
]
EXTENDED = [
    "golden_record_customers", "poisson_bootstrap_order_value",
    "fifo_return_matching", "winnow_shared_fingerprints",
    "interval_sweep_profile", "twap_event_value", "nelson_aalen_hazard",
    "kmeans_refine_clusters", "theil_sen_daily_trend", "bpe_merge_training",
]
# The r16 verdict's next cold-cost tier (item 5) + the sf10 tail raw
# forms (item 6).
COLDTIER = [
    "unigram_lm_prune", "kcenter_coreset_seeds", "hybrid_rrf_fusion_top10",
    "graph_ann_top10", "interval_union_coverage", "kaplan_meier_conversion",
    "markov_attribution", "bpe_merge_training", "bpe_encode_stats",
    "theil_sen_daily_trend",
]


def plan_stats(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnl_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", txt)),
        "batch_eval_python": len(re.findall(r"\bBatchEvalPython\b", txt)),
        "arrow_eval_python": len(re.findall(r"\bArrowEvalPython\b", txt)),
        "map_in_arrow": len(re.findall(r"\bMapInArrow|PythonMapInArrow\b", txt)),
        "wsc_spans": len(re.findall(r"\bWholeStageCodegen\b", txt)),
        "sorts": len(re.findall(r"\bSort\b", txt)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--ops", default="")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--all-extended", action="store_true")
    ap.add_argument("--cold-tier", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--warm", action="store_true",
                    help="run each query once before timing")
    args = ap.parse_args()

    names: list[str] = [s for s in args.ops.split(",") if s]
    if args.all_headline:
        names += [n for n in HEADLINE if n not in names]
    if args.all_extended:
        names += [n for n in EXTENDED if n not in names]
    if args.cold_tier:
        names += [n for n in COLDTIER if n not in names]
    os.makedirs(PLANS_DIR, exist_ok=True)

    spark = get_spark(app_name="opt_r17_measure")
    sc = spark.sparkContext
    # Steady-state warmup (bench discipline): ~60 empty jobs.
    for _ in range(60):
        spark.range(1).collect()

    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        df = q.build(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        pth = os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt")
        with open(pth, "w") as fh:
            fh.write(f"-- {name} @ {args.sf} ({args.tag})\n")
            fh.write(txt)
        stats = plan_stats(txt)
        rec: dict = {"plan": stats}
        if not args.no_time:
            if args.warm:
                sc.setJobDescription(f"{name}: warm")
                q.build(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            best = float("inf")
            samples = []
            n_jobs = None
            for i in range(args.reps):
                group = f"{name}-rep{i}-{args.tag}"
                sc.setJobGroup(group, f"{name}: rep{i}")
                # build INSIDE the timed region: several queries run
                # bounded driver loops at construction time, so
                # build+noop is the only honest end-to-end number
                # (mirrors bench.py's extended methodology).
                t0 = time.perf_counter()
                d = q.build(spark, args.sf)
                d.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                samples.append(round(dt, 4))
                best = min(best, dt)
                try:
                    ids = sc.statusTracker().getJobIdsForGroup(group)
                    n_jobs = len(ids)
                except Exception:
                    pass
            sc.setJobGroup("idle", "idle")
            rec["noop_sec_min"] = round(best, 4)
            rec["noop_sec_samples"] = samples
            rec["spark_jobs_per_run"] = n_jobs
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}", flush=True)

    summary = os.path.join(PLANS_DIR, f"_measure_{args.tag}.json")
    prev = {}
    if os.path.exists(summary):
        with open(summary) as fh:
            prev = json.load(fh)
    prev.update({f"{n}@{args.sf}": r for n, r in out.items()})
    with open(summary, "w") as fh:
        json.dump(prev, fh, indent=1)


if __name__ == "__main__":
    main()
