"""Streaming SCD2 dimension maintenance: keep a type-2 history table
(key, attr, valid_from, valid_to, is_current) up to date from an event
stream, micro-batch by micro-batch.

Batch SCD2 (operators/scd.py) recomputes runs over the full log. The
streaming form must stitch each micro-batch onto the OPEN intervals
already committed — the classic warehouse "close and insert" — without
ever touching closed history rows:

1. Pull the affected keys' CURRENT rows from the dimension (left-semi
   on the batch's distinct keys — bounded by the batch, not the
   dimension).
2. Prepend each current row to its key's batch events as a pseudo-event
   at (valid_from, tiebreak = -inf) carrying the current attribute,
   then run the SAME run-collapse window algebra as the batch operator
   over pseudo + batch. Because the pseudo-event sorts first (the
   in-order contract below), the first resulting run inherits the
   current row's valid_from — equal attributes extend the open
   interval, a changed attribute closes it at the first new run's
   start.
3. MERGE the resulting runs on (key, valid_from): the old current row
   is UPDATED in place (same key + valid_from -> new valid_to /
   is_current=false) and new runs insert. Closed rows are never
   rewritten, so per-batch cost is proportional to the batch's keys —
   at 100 TB the dimension's size is irrelevant to the sync cost.

In-order contract: within a key, every batch event's ts must be >= the
committed current row's valid_from (cross-batch order; within a batch
any order is fine — the window sorts). This is the standard streaming
SCD2 assumption (late attribute history cannot be represented without
rewriting closed intervals); ``strict=True`` (default) ENFORCES it per
batch and raises instead of silently corrupting history.

Replay safety: a replayed batch is NOT generally re-stitchable (its
events can precede the open interval it itself advanced — strict
correctly rejects exactly that shape), so exactly-once goes through
the txlog TXN MAP instead: pass (writer_id, batch_id) and an
already-applied batch short-circuits before the stitch — the same
dedupe contract as sources.txlog.apply_incremental_agg. The
foreachBatch driver wires Spark's monotonic batch_id through
automatically.

Equivalence law (tested): feeding any ts-ordered partition of an event
log through the sink, one batch at a time, yields EXACTLY the batch
operator's history of the full log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NEG_INF_TIEBREAK = -(2**63)


def scd2_apply_batch(
    table,
    batch_df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    strict: bool = True,
    writer_id: str | None = None,
    batch_id: int | None = None,
) -> None:
    """Stitch one micro-batch into the SCD2 table (see module doc).

    `table` is a sources.txlog.TxLogTable holding
    (key, attr, valid_from, valid_to, is_current). With (writer_id,
    batch_id) set, an already-applied batch_id is a no-op (exactly-once
    under replay via the table's txn map).
    """
    from healthcare_aihw_etl_pipeline_spark.operators.scd import scd2_history

    if batch_df.isEmpty():
        return
    if writer_id is not None and batch_id is not None:
        h = table.head()
        applied = h[1].get("txn", {}).get(writer_id, -1) if h else -1
        if batch_id <= applied:
            return
    spark = batch_df.sparkSession
    events = batch_df.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        F.col(tiebreak_col).cast("long").alias(tiebreak_col),
    )
    snap = table.snapshot(spark)
    if snap is not None:
        keys = events.select(key_col).distinct()
        cur = (
            snap.where(F.col("is_current"))
            .join(F.broadcast(keys), key_col, "left_semi")
            .select(
                F.col(key_col),
                F.col(attr_col),
                F.col("valid_from").alias(ts_col),
                F.lit(_NEG_INF_TIEBREAK).alias(tiebreak_col),
            )
        )
        if strict:
            # In-order contract: no batch event may precede its key's
            # open interval. One bounded aggregate over the batch.
            bounds = cur.select(
                F.col(key_col), F.col(ts_col).alias("_cur_from")
            )
            n_late = (
                events.join(bounds, key_col)
                .where(F.col(ts_col) < F.col("_cur_from"))
                .limit(1)
                .count()
            )
            if n_late:
                raise ValueError(
                    "streaming SCD2 received an event earlier than its "
                    "key's open interval — late attribute history cannot "
                    "be stitched without rewriting closed rows. Reprocess "
                    "from batch history (operators/scd.py) instead."
                )
        events = cur.unionByName(events)
    runs = scd2_history(events, key_col, attr_col, ts_col, tiebreak_col)
    # Cut lineage from the table before merging into it (the stitch
    # reads the snapshot the merge will replace); runs are batch-bounded.
    runs = runs.localCheckpoint(eager=True)
    table.merge(
        runs,
        [key_col, "valid_from"],
        writer_id=writer_id,
        batch_id=batch_id,
    )


def write_stream_scd2(
    df: DataFrame,
    table,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    checkpoint: str,
    *,
    available_now: bool = True,
    strict: bool = True,
):
    """foreachBatch driver for :func:`scd2_apply_batch` — the streaming
    query handle maintains the SCD2 table until stopped. Exactly-once
    under replay: Spark's monotonic batch_id is recorded in the table's
    txn map under writer_id "scd2:<checkpoint>", so a redelivered batch
    short-circuits before the stitch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        scd2_apply_batch(
            table,
            batch_df,
            key_col,
            attr_col,
            ts_col,
            tiebreak_col,
            strict=strict,
            writer_id=f"scd2:{checkpoint}",
            batch_id=batch_id,
        )

    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
