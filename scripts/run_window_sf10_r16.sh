#!/bin/bash
# Round-16 sf10 window replay (plain driver_sim sessions, 24g driver
# heap, 25-minute per-batch timeout). Rotation: the 49 names whose
# last sf10 verification dates to r11/r12 (the aged cohorts), the two
# previously oracle-environment-bound names now checkable through
# their registered ALT oracles (SIM_ALT_ORACLE=1 on those batches
# only), dup_span_stats (its oracle completes in ~12 s at sf10 on the
# current corpus — the r15 oracle-cost exclusion no longer holds),
# and six never-replayed driver shapes. Collect with
# scripts/assemble_window_sf10_r16.py.
set -u
LOG=${1:-/tmp/window_sf10_r16_batched.log}
: > "$LOG"
export SIM_SF=/tmp/sfbench/sf10
export PYSPARK_SUBMIT_ARGS="--driver-memory 24g pyspark-shell"
# Standing exclusions (2): graph_ann_top10 (oracle shares the
# quadratic kNN ranked-CTE block; covered by PLANTED_TRUTH recall@10
# = 1.0 at sf1/sf10) and simhash_wide_dup_clusters (oracle bit-replay
# crosses the token stream with range(60) — ~24e9 intermediate rows;
# covered by PLANTED_TRUTH precision 1.0 at 10M docs).
BATCHES=(
  # r16-rotated driver shapes never replayed at sf10
  "pct_change_trend,rollup_returnflag_status,grouping_sets_revenue"
  "range_join_ship_lag,customer_order_stats,unpivot_lineitem_measures"
  # dup_span_stats rejoins the window (oracle ~12 s at sf10 now)
  "dup_span_stats"
  # aged r11/r12 cohort
  "consistent_hash_resharding,cuped_ab_adjustment,decision_stump_quantity_split"
  "event_trigram_patterns,events_hourly_window,fifo_return_matching,filter_in_agg"
  "greedy_source_coverage,grid_density_clusters,hybrid_rrf_fusion_top10"
  "json_props_agg,kmeans_refine_clusters,largest_remainder_allocation"
  "poisson_bootstrap_order_value,pricing_summary,revenue_by_nation"
  "segmented_trend_changepoint,skyline_orders,theil_sen_daily_trend"
  "top10_brands_by_revenue,top_nation,twap_event_value"
  "wasserstein_daily_revenue,winnow_shared_fingerprints,zorder_layout_stats"
  "ann_cosine_top10,ann_sq4_adc_top10,audio_pcm_features"
  "bloom_prune_orders,customer_acquisition_curve,dow_adjusted_anomalies"
  "bpe_merge_training"
  "dp_noised_priority_counts,frequent_values_orders,hashed_feature_profile"
  "isotonic_calibration_by_age,ivm_full_outer_snapshot,jaccard_pair_similarity"
  "json_props_variant_agg,lineitem_correlation_matrix,logistic_newton_step"
  "nation_revenue_share,numeric_profile_lineitem,order_value_percentiles_by_status"
  "orders_date_islands,pca_power_component,roc_auc_order_age"
  "u_shaped_attribution,video_avi_features"
)
for b in "${BATCHES[@]}"; do
  echo "=== batch: $b" >> "$LOG"
  timeout 1500 env SIM_ONLY="$b" python scripts/driver_sim.py >> "$LOG" 2>&1
  echo "=== rc=$? for $b" >> "$LOG"
done
# The two formerly environment-bound names, checked through their ALT
# oracles. keep_best's collapse-first CTE is cheap; the triangle's
# JOIN-counted wedge probe is the one genuinely long oracle (~6 min at
# sf1, wedge-space 10x at sf10) — solo batch, 2.5-hour cap, placed
# last so a timeout cannot displace anything else. A timeout here is
# a data point: the exclusion then stands on measured evidence.
echo "=== batch: embedding_cluster_keep_best (alt oracle)" >> "$LOG"
timeout 1500 env SIM_ONLY="embedding_cluster_keep_best" SIM_ALT_ORACLE=1 \
  python scripts/driver_sim.py >> "$LOG" 2>&1
echo "=== rc=$? for embedding_cluster_keep_best" >> "$LOG"
echo "=== batch: copurchase_triangle_count (alt oracle)" >> "$LOG"
timeout 9000 env SIM_ONLY="copurchase_triangle_count" SIM_ALT_ORACLE=1 \
  python scripts/driver_sim.py >> "$LOG" 2>&1
echo "=== rc=$? for copurchase_triangle_count" >> "$LOG"
echo "DONE" >> "$LOG"
