"""Streaming distribution-drift monitoring: PSI per event-time window
against a static reference distribution.

The production-monitoring twin of the batch `value_drift_psi` query:
a reference (training-time) value distribution is computed once from
history, and the live stream's per-window bucket distributions are
scored against it as windows close — the alerting loop that catches
upstream schema faults, bot floods, or population shift before they
poison a training snapshot.

Shape, Spark-native end to end:

1. ``reference_counts`` — one batch aggregation over the reference
   slice: (key, bucket) counts plus the per-key total. Small (bucket
   domain x key domain); broadcast to the stream side.
2. ``windowed_bucket_counts`` — the streaming leg: watermarked
   event-time windows, groupBy(window, key, bucket). Append mode:
   a (window, key, bucket) group emits exactly once, when the
   watermark closes its window — so downstream PSI sees each window's
   complete bucket set in a single trigger flush.
3. ``psi_of_counts`` — the SHARED scoring algebra (stream sink or
   batch twin, same function): LEFT-join from the stream's buckets to
   the reference (standard PSI practice: a bucket the reference never
   saw takes the epsilon-smoothed probability 1/PSI_Q, so a window
   landing entirely in novel buckets scores a huge PSI and trips the
   alert instead of silently emitting nothing), per-bucket
   contribution (p2-p1)*ln(p2/p1) quantized to integer millionths
   BEFORE the cross-bucket sum (the `value_drift_psi` exactness
   discipline), grouped to one row per (window, key) with the classic
   0.1 drift flag plus unmatched_buckets / unmatched_mass diagnostics.
4. ``monitor_drift`` — wires 2+3 into a foreachBatch parquet sink
   writing each batch to its own overwritten subdirectory, so the
   at-least-once replay contract cannot duplicate scored rows;
   restart-safe via the standard checkpoint contract.

Scale notes: the only unbounded state is the open-window aggregation,
bounded by watermark horizon x key x bucket cardinality; the reference
join is a broadcast; nothing shuffles at event grain after the first
windowed groupBy (map-side combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PSI_Q = 1_000_000
BUCKET_WIDTH = 50.0


def value_bucket(col: str = "value") -> F.Column:
    """Equi-width value bucket shared by reference and stream legs."""
    return F.floor(F.col(col) / F.lit(BUCKET_WIDTH)).cast("long")


def reference_counts(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Static reference: (key, bucket, c_ref) + per-key total n_ref."""
    c = events.select(
        F.col(key_col).alias("key"), value_bucket().alias("bucket")
    ).groupBy("key", "bucket").agg(F.count(F.lit(1)).alias("c_ref"))
    n = c.groupBy("key").agg(F.sum("c_ref").alias("n_ref"))
    return c.join(n, "key")


def windowed_bucket_counts(
    events: DataFrame,
    *,
    window: str = "1 day",
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming (window, key, bucket) counts; append-emitted once per
    closed window. Also works on a batch frame (same expressions)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.select(
            "ts", F.col(key_col).alias("key"), value_bucket().alias("bucket")
        )
        .groupBy(F.window("ts", window).alias("w"), "key", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "key",
            "bucket",
            "c",
        )
    )


def psi_of_counts(counts: DataFrame, ref: DataFrame) -> DataFrame:
    """Score (window_start, key, bucket, c) rows against the reference:
    one row per (window_start, key) with n_buckets / psi_q / psi /
    drifted / unmatched_buckets / unmatched_mass. Shared by the
    streaming foreachBatch and the batch twin — bit-identical by
    construction.

    Smoothing is TWO-SIDED (the standard form): stream buckets absent
    from the reference take the epsilon-smoothed reference probability
    1/PSI_Q — a window landing entirely in novel buckets scores
    ~p2*ln(p2*PSI_Q) per bucket and trips `drifted` loudly — and,
    symmetrically, reference buckets with ZERO stream count in a window
    still score, with epsilon-smoothed stream probability 1/PSI_Q, so
    mass vanishing from a dominant bucket into shifted ones can no
    longer underscore. A (window, key) with no stream rows at all emits
    nothing (there is no window to score). `n_buckets` counts all
    scored buckets (observed ∪ reference).
    """
    n = counts.groupBy("window_start", "key").agg(F.sum("c").alias("n"))
    expected = n.select("window_start", "key").join(F.broadcast(ref), ["key"])
    j = (
        counts.join(
            expected.select(
                "window_start", "key", "bucket", "c_ref", "n_ref"
            ),
            ["window_start", "key", "bucket"],
            "full",
        )
        .join(n, ["window_start", "key"])
    )
    matched = F.col("c_ref").isNotNull()
    present = F.col("c").isNotNull()
    p1 = F.when(
        matched, F.col("c_ref").cast("double") / F.col("n_ref").cast("double")
    ).otherwise(F.lit(1.0 / PSI_Q))
    p2 = F.when(
        present, F.col("c").cast("double") / F.col("n").cast("double")
    ).otherwise(F.lit(1.0 / PSI_Q))
    contrib_q = F.floor(
        (p2 - p1) * F.log(p2 / p1) * F.lit(PSI_Q) + F.lit(0.5)
    ).cast("long")
    return (
        j.select(
            "window_start",
            "key",
            contrib_q.alias("contrib_q"),
            F.when(matched, F.lit(0)).otherwise(F.lit(1)).alias("_um"),
            F.when(matched, F.lit(0)).otherwise(F.col("c")).alias("_umc"),
            "n",
        )
        .groupBy("window_start", "key")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("contrib_q").alias("psi_q"),
            F.sum("_um").alias("unmatched_buckets"),
            (
                F.sum("_umc").cast("double") / F.first("n").cast("double")
            ).alias("unmatched_mass"),
        )
        .select(
            "window_start",
            "key",
            "n_buckets",
            "psi_q",
            (F.col("psi_q").cast("double") / F.lit(float(PSI_Q))).alias("psi"),
            (F.col("psi_q") > F.lit(PSI_Q // 10)).alias("drifted"),
            "unmatched_buckets",
            "unmatched_mass",
        )
    )


def monitor_drift(
    events_stream: DataFrame,
    ref: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 day",
    watermark: str = "2 hours",
    available_now: bool = False,
):
    """Start the monitoring query: closed windows are scored against
    `ref` and written under `out_dir` as per-batch parquet
    subdirectories (idempotent under replay). Returns the
    StreamingQuery. Each foreachBatch flush carries complete closed
    windows (append-mode watermark contract), so scoring inside the
    batch sees every bucket of the windows it scores.
    `available_now=True` drains the backlog and stops (test/batch-
    catchup shape); the default runs continuously."""
    counts = windowed_bucket_counts(
        events_stream, window=window, watermark=watermark
    )

    def _score(batch: DataFrame, bid: int) -> None:
        # foreachBatch is AT-LEAST-ONCE: after a crash between sink
        # write and offset commit, the same batch id replays. Writing
        # each batch under its own batch= subdirectory with overwrite
        # makes the replay idempotent (the classic idempotent-sink
        # pattern; the engine's txn-map MERGE is the keyed-table
        # alternative) — readers load the whole directory.
        scored = psi_of_counts(batch, ref)
        scored.write.mode("overwrite").parquet(f"{out_dir}/batch={bid}")

    w = (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_score)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
