"""Streaming SPRT monitor: Wald's sequential test over a live event
stream — the streaming twin of the batch ``sprt_ab_decision`` query.

The sequential probability ratio test IS a streaming algorithm:
evidence accumulates day by day and the experiment stops at the first
boundary crossing — a batch engine replays the whole history per look,
while the streaming form emits each day's evidence exactly once as the
watermark closes it. Shape, Spark-native end to end:

1. ``daily_conversions`` — the shared evidence leg (identical
   expressions batch or stream, the drift-monitor discipline): md5
   user split into variants, purchase-vs-click conversions, one
   watermarked 1-day event-time window per (day, variant), append
   mode — a closed day emits exactly once.
2. ``monitor_sprt`` — foreachBatch parquet sink with the per-batch
   overwrite layout (at-least-once replays cannot duplicate a day).
3. The DECISION layer is the batch query's own surface
   (plans/round13b_queries._sprt_surface) applied to the accumulated
   daily relation: cumulative LLR, first boundary crossing, final
   state. Decisions need the full evidence prefix, so they read the
   silver daily table — the standard lambda-free serving split
   (stream maintains evidence; the decision is a cheap bounded read).

Scale notes: open state is bounded by watermark horizon × 2 variants;
nothing shuffles at event grain after the windowed groupBy (map-side
combined); the decision input is the calendar-bounded daily relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def variant_of(user_col: str = "user_id") -> F.Column:
    """md5 A/B user split — shared by the batch query and the stream."""
    h1 = F.substring(F.md5(F.col(user_col).cast("string")), 1, 1)
    return (
        F.when(F.conv(h1, 16, 10).cast("int") % 2 == 0, "A")
        .otherwise("B")
    )


def daily_conversions(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """(day, variant, n, x) — daily purchase-vs-click evidence. On a
    stream: watermarked 1-day windows, append-emitted once per closed
    day. On a batch frame: the same expressions (the drift-monitor
    shared-leg discipline)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.where(F.col("event_type").isin("purchase", "click"))
        .select(
            "ts",
            variant_of().alias("variant"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("x0"),
        )
        .groupBy(F.window("ts", "1 day").alias("w"), "variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x0").cast("long").alias("x"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "variant",
            "n",
            "x",
        )
    )


def monitor_sprt(
    stream_events: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    available_now: bool = False,
):
    """Maintain the daily-evidence silver table from a stream. Each
    batch writes to its own overwritten subdirectory, so at-least-once
    replays keep (day, variant) unique; restart-safe via the standard
    checkpoint contract. out_path's lifetime is TIED to the
    checkpoint: starting against an existing evidence directory with a
    fresh checkpoint would re-number batches and leave stale batch=N
    dirs duplicating evidence — guarded with a loud error instead of a
    silently double-counted LLR. Decisions read the accumulated output
    through the batch surface (see module docstring)."""
    import glob
    import os

    have_batches = bool(glob.glob(os.path.join(out_path, "batch=*")))
    if not os.path.exists(checkpoint) and have_batches:
        raise ValueError(
            f"evidence dir {out_path!r} has batches from a previous "
            "run but no matching checkpoint — reuse the original "
            "checkpointLocation or start with a fresh out_path"
        )
    # Inverse guard: a checkpoint that has COMMITTED batches will
    # resume past them without re-emitting, so if the evidence dir was
    # deleted (or partially deleted) the decision layer would read a
    # silently truncated LLR prefix. Committed offsets live as files
    # under <checkpoint>/commits/<batchId> per the Structured Streaming
    # checkpoint contract.
    commits = [
        c
        for c in glob.glob(os.path.join(checkpoint, "commits", "*"))
        if os.path.basename(c).isdigit()
    ]
    if commits and not have_batches:
        raise ValueError(
            f"checkpoint {checkpoint!r} has {len(commits)} committed "
            f"batches but evidence dir {out_path!r} has none — the "
            "evidence was deleted; restore it or start BOTH paths fresh"
        )
    daily = daily_conversions(stream_events)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    w = (
        daily.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
