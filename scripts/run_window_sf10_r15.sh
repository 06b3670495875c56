#!/bin/bash
# Round-15 sf10 driver-window replay: the 50-name r15 window in
# batches against /tmp/sfbench/sf10 (plain driver_sim sessions,
# 24g driver heap, 25-minute per-batch timeout so a pathological
# oracle cannot stall the rung). Collect with
# scripts/assemble_window_sf10_r15.py.
set -u
LOG=${1:-/tmp/window_sf10_r15_batched.log}
: > "$LOG"
export SIM_SF=/tmp/sfbench/sf10
export PYSPARK_SUBMIT_ARGS="--driver-memory 24g pyspark-shell"
# Exclusions (documented in the artifact): graph_ann_top10 /
# simhash_wide_dup_clusters / dup_span_stats oracles are quadratic or
# corpus-crossing at the replicated sf10 layout (covered by
# PLANTED_TRUTH / recall-law rungs). The minhash*_portable oracles
# replay the full md5-minwise pipeline over 5M docs in DuckDB — run
# solo last; in the committed r15 run BOTH finished and hash-matched.
BATCHES=(
  "t_closeness_audit_served,t_closeness_audit"
  "minhash_verified_dup_clusters,assoc_rules_top20,markov_attribution"
  "rdd_order_value,bh_fdr_nation_tests"
  "hll_rollup_distinct_users,theta_sketch_audience_overlap,theta_retention_day7,json_props_regexp_agg"
  "ann_qlsh_top10_portable,k_anonymity_audit,cms_token_heavy_hitters"
  "token_shard_plan,daily_value_interpolated,copurchase_2hop_reach"
  "value_drift_psi,priority_status_mutual_info,benford_first_digit_audit,ivm_join_snapshot"
  "daily_revenue_autocorr,dow_revenue_seasonality,last_touch_attribution"
  # embedding_cluster_keep_best rides with the simhash portable below:
  # this four-query batch hit the 25-min cap in one run when grouped
  "cluster_aware_split,session_pattern_match,revenue_changepoint"
  "linear_decay_attribution,ab_value_t_statistic,quality_decile_lift,priority_status_chi2"
  "bm25_search_top10,inverted_index_top20,phrase_search_top10"
  "weighted_sample_orders,scd2_user_tier_history,scd2_temporal_join,data_quality_audit"
  "quantile_sketch_prices,doc_bigram_nll_top20,supplier_balance_distribution"
  "copurchase_triangle_count,pivot_dynamic_priority,bm25_eval_screen_top3"
  "simhash_dup_clusters_portable,embedding_cluster_keep_best"
  # the two portable MinHash twins last, solo: their oracles replay the
  # full md5-minwise pipeline over 5M docs inside DuckDB — if the batch
  # timeout fires, the documented exclusion stands on measured evidence
  "minhash_dup_clusters_portable"
  "minhash_verified_dup_clusters_portable"
)
for b in "${BATCHES[@]}"; do
  echo "=== batch: $b" >> "$LOG"
  timeout 1500 env SIM_ONLY="$b" python scripts/driver_sim.py >> "$LOG" 2>&1
  echo "=== rc=$? for $b" >> "$LOG"
done
echo "DONE" >> "$LOG"
