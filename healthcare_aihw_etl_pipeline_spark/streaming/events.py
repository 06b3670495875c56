"""Structured Streaming surface over the events fact pattern
(SURVEY §2.11 — [driver] mandate; the reference itself is batch-only,
re-run via cron with full-replace writes, /root/reference/README.md:108).

Design: every aggregation here is the *same expression* as its batch
twin in plans.reference_queries (e.g. hourly_event_counts ≡
events_hourly_window) applied to a streaming DataFrame — the Spark
unified-engine contract. Correctness strategy (SURVEY §7.3 hard part 2):
late-data semantics have no SQL oracle, so tests replay a file source
with Trigger.AvailableNow into a memory sink and assert equivalence with
the batch aggregation over the same files, plus targeted late/duplicate
injection through a rate-limited replay.

Scale notes:
- watermarks bound state: state store size ≈ (#keys live within the
  watermark horizon), not stream length.
- `dropDuplicatesWithinWatermark` is the at-least-once → exactly-once
  repair for event_id replays.
- shuffle partitions size the state store; AQE does not apply to
  streaming stages, so `spark.sql.shuffle.partitions` matters here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_aihw_etl_pipeline_spark.plans.registry import cents, dollars

# Raw parquet schema of the events table when ts is INT64
# TIMESTAMP(NANOS): Spark reads the column as long under the
# nanosAsLong legacy conf (see sources.catalog.load_table). Corpus
# generations with TIMESTAMP(MICROS) read ts as timestamp_ntz instead;
# read_event_stream resolves which one the files actually carry.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream → event-time TIMESTAMP.

    The streaming file source requires an explicit schema, but the
    corpus's physical ts type has varied across generations
    (TIMESTAMP(NANOS) → long under nanosAsLong; TIMESTAMP(MICROS) →
    timestamp_ntz). Forcing the wrong schema silently mis-scales every
    event time by 1000×, so the schema is resolved from the actual
    parquet footers via a batch read (metadata-only, no rows scanned).

    Watermarks REQUIRE the event-time column to be TIMESTAMP (with
    local timezone): nanos-long is rebuilt from epoch micros
    (timezone-independent); NTZ wall time is interpreted under the
    session clock (UTC in this engine's sessions). Only the *rendering*
    of window bounds follows the session timezone.

    When the source directory is empty (stream started before the first
    file lands — a normal deployment shape), the batch probe cannot infer
    a schema; fall back to EVENTS_RAW_SCHEMA (nanos-long form), matching
    the corpus generator's current physical layout."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
    except Exception:  # AnalysisException: unable to infer schema (no files)
        schema = EVENTS_RAW_SCHEMA
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        # One file per micro-batch (oldest mtime first): the replay knob
        # that turns a file directory into an ordered sequence of
        # micro-batches — how the late-data tests drive watermark
        # advancement deterministically, and how a backfill bounds
        # per-trigger work in production.
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type — the streaming twin of the
    batch query `events_hourly_window` (plans.reference_queries), with a
    watermark bounding late data and state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("sv"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            dollars(F.col("sv"), "sum_value", 2),
        )
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping
    buckets (4 here) — Expand node, state per open window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) — F.session_window merges
    events separated by < gap into one growing window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("sv"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            dollars(F.col("sv"), "session_value", 2),
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once repair for at-least-once sources: drop replayed
    event_ids arriving within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def user_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator (driver mandate: applyInPandasWithState):
    per-user running event count and value total, emitted on every update.

    State is one (count, total_cents) pair per user — bounded by the
    active-user cardinality, the canonical per-key state shape.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        n, cents_total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # HALF_UP (half-away-from-zero) cents, matching the
            # engine-wide cents() policy (plans.registry): pandas
            # Series.round is half-to-even and would diverge from the
            # batch twin on exact half-cent inputs; floor(x+0.5) would
            # diverge on negative halves.
            vals = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
            cents = np.copysign(np.floor(np.abs(vals) * 100.0 + 0.5), vals)
            cents_total += int(cents.astype(np.int64).sum())
        state.update((n, cents_total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents_total / 100.0]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs a working google.protobuf on the
    Python workers (its state-server protocol is protobuf-framed); this
    container ships a broken protobuf, so callers/tests gate on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_running_totals_processor():
    """Build the StatefulProcessor class for
    :func:`user_running_totals_tws`. Module-level (not a closure) so the
    processor LOGIC is testable by driving it with a fake state handle
    where the container's protobuf cannot run the TWS state server —
    the documented-equivalence rung behind the env-gated skip: the
    handle protocol (init → getValueState; exists/get/update per key)
    is exercised against an in-memory ValueState stub and the emissions
    compared to the GroupState twin, leaving only Spark's
    protobuf-framed state-server WIRE as the untested seam."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("total_cents", T.LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            import numpy as np

            n, cents_total = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                # same HALF_UP cents policy as user_running_totals
                vals = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
                cents = np.copysign(np.floor(np.abs(vals) * 100.0 + 0.5), vals)
                cents_total += int(cents.astype(np.int64).sum())
            self._state.update((n, cents_total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents_total / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals


def user_running_totals_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Spark 4 `transformWithStateInPandas` twin of
    :func:`user_running_totals` — same per-user (count, cents-total)
    state and update-mode emissions, expressed with the newer
    StatefulProcessor API (object lifecycle + named value state via the
    handle, instead of a GroupState closure). The new API is where
    multi-state/timers/TTL live; the GroupState form remains the
    portable default.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) and a working protobuf
    (:func:`tws_available`); the equivalence test against the GroupState
    twin runs wherever both hold, and the processor LOGIC is
    additionally pinned everywhere by the fake-handle replay
    (tests/test_streaming.py) so the env-gated skip covers only the
    state-server wire."""
    RunningTotals = _make_running_totals_processor()

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def interval_join_clicks_to_purchases(
    events: DataFrame,
    *,
    lookback: str = "INTERVAL 30 MINUTES",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``lookback`` window (click strictly
    before the purchase).

    The time-range condition plus both-side watermarks is what makes the
    state bounded: Spark retires a buffered click once the watermark
    passes ``click.ts + lookback`` (no purchase can match it anymore),
    so state ≈ (events within watermark + lookback horizon), not stream
    length. Left-outer emits unmatched purchases after the horizon
    closes. Note the GLOBAL watermark is the MIN across the two
    withWatermark nodes (multipleWatermarkPolicy default) — a stalled
    click stream delays purchase-state eviction, the safe default. The
    batch twin is plans.llm_queries.purchase_click_window, which
    aggregates the same join hash-checked against DuckDB.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            cents(F.col("value")).alias("click_value_cents"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
    )
    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.expr(f"ts - {lookback}"))
        & (F.col("click_ts") < F.col("ts"))
    )
    return purchases.join(clicks, cond, "leftOuter").select(
        "event_id", "user_id", "ts", "click_ts", "click_value_cents"
    )


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
    partition_by: str | None = None,
):
    """Checkpointed parquet streaming sink: append-mode exactly-once file
    output (the streaming twin of sinks.write_table). Returns the started
    StreamingQuery; with available_now the caller awaits termination for
    a drain-everything batch run."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_upsert_partitions(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str],
    *,
    key_cols: list[str] | None = None,
    available_now: bool = True,
    verify_replace: bool = True,
):
    """Streaming incremental load: each micro-batch replaces exactly the
    partitions it contains (foreachBatch + dynamic partition overwrite) —
    the idempotent-restart pattern for a date-partitioned landing table.
    A replayed batch rewrites the same partitions to the same content, so
    at-least-once delivery still converges to exactly-once state.

    Two modes:

    * ``key_cols=None`` (partition-replace): each batch must carry a
      COMPLETE refresh of every partition it touches. A partition whose
      rows arrive across several micro-batches would shrink to the last
      batch's rows — if the source can split a partition across batches,
      pass ``key_cols``. The precondition is ENFORCED at runtime while
      ``verify_replace=True`` (default): before overwriting, existing
      rows in the touched partitions must be a multiset-subset of the
      batch (``exceptAll`` — NULL-safe, duplicate-aware). A replayed
      batch is identical content and passes; a partition-spanning source
      raises instead of silently losing rows. The check costs one
      read-back of the touched partitions — the same cost class as the
      keyed merge; sources that legitimately shrink a partition (full
      refresh with deletions) set ``verify_replace=False`` and own the
      precondition themselves.
    * ``key_cols=[...]`` (row-grain MERGE): before overwriting, the sink
      reads back the touched partitions, keeps existing rows whose key is
      absent from the batch (left-anti), and unions the batch in. Safe
      under partition-spanning batches AND replay (a replayed batch's
      keys are already present, so merge is a fixed point). The read-back
      is bounded by the touched partitions (left-semi on a broadcast
      partition-key set), which is exactly how MERGE-on-parquet costs at
      scale; the log-based form — atomic snapshot commits, copy-on-write
      file pruning, exactly-once via a txn map — is implemented in
      `sources.txlog.TxLogTable` / `write_stream_txlog_merge`.
    """
    from pyspark.errors import AnalysisException

    from healthcare_aihw_etl_pipeline_spark.sources.sinks import upsert_partitions

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = batch_df
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(path)
        except AnalysisException:
            existing = None
        if key_cols:
            if existing is not None:
                touched = batch_df.select(*partition_by).distinct()
                survivors = (
                    existing.join(F.broadcast(touched), partition_by, "left_semi")
                    .join(
                        batch_df.select(*key_cols).distinct(), key_cols, "left_anti"
                    )
                    .select(*batch_df.columns)
                )
                # Cut lineage from `path` before overwriting it — the
                # writer rejects plans that read the destination.
                out = survivors.unionByName(batch_df).localCheckpoint(eager=True)
        elif verify_replace and existing is not None:
            touched = batch_df.select(*partition_by).distinct()
            existing_touched = existing.join(
                F.broadcast(touched), partition_by, "left_semi"
            ).select(*batch_df.columns)
            if not existing_touched.exceptAll(batch_df).isEmpty():
                raise ValueError(
                    "partition-replace batch would lose rows: the touched "
                    "partitions already contain rows absent from this "
                    "micro-batch (the source splits partitions across "
                    "batches). Pass key_cols for row-grain MERGE, or "
                    "verify_replace=False if the shrink is intentional."
                )
        upsert_partitions(out, path, partition_by)

    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_with_user_dim(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a slowly-changing
    user dimension (cohort, tier, first-seen date, ...).

    Spark's stream-static join re-evaluates the STATIC side's plan each
    micro-batch — a dim UPDATE between batches is picked up without
    restarting the query (the unified-engine alternative to a dimension
    cache with TTL). The static side should be broadcast-sized or
    bucketed on the key; no state store is involved (unlike
    stream-stream joins), so there is no watermark requirement for the
    join itself.

    Left join keeps unmatched events (a brand-new user's events arrive
    before the dim refresh lands) with NULL dim columns — the standard
    late-arriving-dimension posture."""
    return events.join(F.broadcast(user_dim), "user_id", "left")


def user_first_seen_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic user dimension derived from the batch events
    table: first-seen timestamp and a stable engagement cohort. Stands
    in for an external SCD table in tests; any (user_id, attrs) relation
    joins through enrich_with_user_dim identically."""
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_seen"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "first_seen",
            F.when(F.col("n_events") >= 100, F.lit("heavy"))
            .when(F.col("n_events") >= 10, F.lit("regular"))
            .otherwise(F.lit("light"))
            .alias("cohort"),
        )
    )


def _accumulate_user_spans(state, pdfs) -> None:
    """Shared span-state machinery for the daily sweep twins
    (daily_peak_concurrency / daily_sweep_profile): widen each user's
    [first, last] µs span with this batch's events and store the three
    parallel arrays back. Order-insensitive by construction — spans
    only widen — which is what makes out-of-order arrival within the
    watermark safe for both consumers."""
    spans: dict = {}
    if state.exists:
        users, smin, smax = state.get
        spans = {u: [lo, hi] for u, lo, hi in zip(users, smin, smax)}
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        for u, t in zip(pdf["user_id"].astype("int64"), ts_us):
            u = int(u)
            t = int(t)
            span = spans.get(u)
            if span is None:
                spans[u] = [t, t]
            else:
                if t < span[0]:
                    span[0] = t
                if t > span[1]:
                    span[1] = t
    state.update(
        (
            list(spans.keys()),
            [span[0] for span in spans.values()],
            [span[1] for span in spans.values()],
        )
    )


def _utc_day_end_ms(day) -> int:
    """End-of-day epoch millis computed explicitly in UTC: the day
    grouping (to_date) and the watermark run under the session timezone
    pinned to UTC, but a naive datetime's .timestamp() uses the Python
    worker's OS-local zone — on a non-UTC host the timeout would shift
    by the UTC offset (early close -> duplicate partial emit, or a
    re-registered timeout already behind the watermark). Same fix as
    sources/txlog.py as_of-naive-datetime handling."""
    import datetime as _dt

    day_end = _dt.datetime(
        day.year, day.month, day.day, tzinfo=_dt.timezone.utc
    ) + _dt.timedelta(days=1)
    return int(day_end.timestamp() * 1000)


def daily_peak_concurrency(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch sweep-line `max_concurrent_sessions`
    (plans.round11_queries): per event-day, the number of user activity
    spans (first..last event of each user that day, closed intervals)
    and the day's PEAK concurrency, emitted exactly once when the
    watermark closes the day (event-time timeout).

    A prefix-sum sweep cannot be expressed as a streaming windowed
    aggregate (it needs the day's complete, ordered boundary multiset),
    so this is the canonical custom-stateful shape: state per day is
    the per-user span table — three parallel arrays, bounded by the
    day's active-user cardinality, NOT its event count (each event
    only widens its user's span) — and the O(u log u) sweep runs once
    at close, in the Arrow batch handler, on metadata-sized state.
    Out-of-order arrival within the watermark is handled by
    construction: spans only widen, and the sweep sees the final
    table. The tie rule matches the batch query bit-for-bit: a span
    ending at t and one starting at t ARE concurrent (+1 before -1).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("day", T.StringType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("max_concurrent", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("users", T.ArrayType(T.LongType())),
            T.StructField("smin", T.ArrayType(T.LongType())),
            T.StructField("smax", T.ArrayType(T.LongType())),
        ]
    )
    _EMPTY = pd.DataFrame(
        {"day": pd.Series(dtype="object"),
         "n_sessions": pd.Series(dtype="int64"),
         "max_concurrent": pd.Series(dtype="int64")}
    )

    def update(key, pdfs, state: GroupState):
        day = key[0]
        if state.hasTimedOut:
            users, smin, smax = state.get
            starts = sorted(smin)
            ends = sorted(smax)
            cur = peak = 0
            i = j = 0
            n = len(starts)
            while i < n:
                # starts first on ties: closed intervals are concurrent
                if starts[i] <= ends[j]:
                    cur += 1
                    peak = max(peak, cur)
                    i += 1
                else:
                    cur -= 1
                    j += 1
            state.remove()
            yield pd.DataFrame(
                {
                    "day": [day.isoformat()],
                    "n_sessions": [n],
                    "max_concurrent": [peak],
                }
            )
            return
        _accumulate_user_spans(state, pdfs)
        # Close when the watermark passes end-of-day: emit-once-per-day.
        state.setTimeoutTimestamp(_utc_day_end_ms(day))
        yield _EMPTY

    return (
        events.withWatermark("ts", watermark)
        .withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def daily_sweep_profile(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the FUSED batch sweep `interval_sweep_profile`
    (plans.round12_queries / operators.sweep): per event-day, ALL the
    sweep-derived measures — session count, peak concurrency, union
    coverage, total span time, concurrency integral — emitted exactly
    once when the watermark closes the day.

    Same state shape as `daily_peak_concurrency` (per-user span table:
    three parallel arrays bounded by the day's ACTIVE-USER cardinality,
    not its event count — spans only widen, so out-of-order arrival
    within the watermark is handled by construction), with the close
    handler running the full boundary sweep instead of only the peak:
    one O(u log u) sort of starts/ends, then a two-pointer walk
    accumulating peak, covered time (gap where running > 0) and the
    concurrency integral (gap x running). The tie rule matches the
    batch operator bit-for-bit: boundaries process in (t asc, +1
    before -1) order, and zero-length segments contribute nothing, so
    within-tie order cannot change any output. The Fubini identity
    (integral == total span time) holds on every emitted row — the
    same built-in cross-check the batch oracle carries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("day", T.StringType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("max_concurrent", T.LongType()),
            T.StructField("covered_us", T.LongType()),
            T.StructField("total_session_us", T.LongType()),
            T.StructField("user_us_integral", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("users", T.ArrayType(T.LongType())),
            T.StructField("smin", T.ArrayType(T.LongType())),
            T.StructField("smax", T.ArrayType(T.LongType())),
        ]
    )
    _EMPTY = pd.DataFrame(
        {
            "day": pd.Series(dtype="object"),
            "n_sessions": pd.Series(dtype="int64"),
            "max_concurrent": pd.Series(dtype="int64"),
            "covered_us": pd.Series(dtype="int64"),
            "total_session_us": pd.Series(dtype="int64"),
            "user_us_integral": pd.Series(dtype="int64"),
        }
    )

    def update(key, pdfs, state: GroupState):
        day = key[0]
        if state.hasTimedOut:
            users, smin, smax = state.get
            starts = sorted(smin)
            ends = sorted(smax)
            n = len(starts)
            total = sum(e - s for s, e in zip(smin, smax))
            cur = peak = 0
            covered = integral = 0
            i = j = 0
            prev_t = None
            while j < len(ends):
                # next boundary: starts first on ties (+1 before -1,
                # the closed-interval rule)
                if i < n and starts[i] <= ends[j]:
                    t = starts[i]
                else:
                    t = ends[j]
                if prev_t is not None and t > prev_t and cur > 0:
                    gap = t - prev_t
                    covered += gap
                    integral += gap * cur
                if i < n and starts[i] <= ends[j]:
                    cur += 1
                    peak = max(peak, cur)
                    i += 1
                else:
                    cur -= 1
                    j += 1
                prev_t = t
            state.remove()
            yield pd.DataFrame(
                {
                    "day": [day.isoformat()],
                    "n_sessions": [n],
                    "max_concurrent": [peak],
                    "covered_us": [covered],
                    "total_session_us": [total],
                    "user_us_integral": [integral],
                }
            )
            return
        _accumulate_user_spans(state, pdfs)
        state.setTimeoutTimestamp(_utc_day_end_ms(day))
        yield _EMPTY

    return (
        events.withWatermark("ts", watermark)
        .withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
