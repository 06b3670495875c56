"""Streaming tests: batch-replay equivalence (SURVEY §7.3 hard part 2 —
the streaming aggregation over a file source with Trigger.AvailableNow
must equal the batch twin on the same data), late/duplicate handling,
session windows, and the custom stateful operator."""

from __future__ import annotations

import datetime as _dt
import os
import uuid

import pytest
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY
from healthcare_aihw_etl_pipeline_spark.streaming import (
    dedup_within_watermark,
    hourly_event_counts,
    read_event_stream,
    session_windows,
    sliding_event_counts,
    user_running_totals,
)


def run_to_memory(df, name: str, output_mode: str) -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.fixture()
def sink_name():
    return "t" + uuid.uuid4().hex[:8]


def _max_event_ts(spark, sf_dir):
    """Max event time as a naive datetime (UTC wall time)."""
    import datetime as dt

    ns = spark.read.parquet(f"{sf_dir}/events.parquet")
    # raw ns epoch (read via nanosAsLong in the catalog) or timestamp —
    # normalize through the batch catalog instead:
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    m = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    assert ns.count() > 0
    return m if isinstance(m, dt.datetime) else m


def test_hourly_counts_match_batch(spark, sf_dir, events_stream_dir, sink_name):
    """Append-mode streaming emits exactly the windows closed by the final
    watermark (window_end <= max_ts - delay); on those, values must equal
    the batch twin bit-for-bit. Later windows are held in state — correct
    streaming semantics, not loss."""
    import datetime as dt

    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(hourly_event_counts(stream, watermark="2 hours"), sink_name, "append")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(sink_name).collect()
    }
    cutoff = _max_event_ts(spark, sf_dir) - dt.timedelta(hours=2)
    batch = REGISTRY["events_hourly_window"].fn(spark, sf_dir)
    want = {}
    for r in batch.collect():
        start = dt.datetime.strptime(r.window_start, "%Y-%m-%d %H:%M:%S")
        if start + dt.timedelta(hours=1) <= cutoff:
            want[(r.window_start, r.event_type)] = (r.n_events, r.sum_value)
    assert want, "cutoff left no closed windows - test data too short"
    assert got == want


def test_sliding_windows_overlap(spark, sf_dir, events_stream_dir, sink_name):
    """Every event lands in window/slide = 4 overlapping windows; emitted
    (watermark-closed) sliding counts must match the batch computation on
    the same closed-window subset."""
    import datetime as dt

    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(sliding_event_counts(stream), sink_name, "append")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table(sink_name).collect()
    }
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    cutoff = _max_event_ts(spark, sf_dir) - dt.timedelta(hours=2)
    want = {}
    for r in batch.collect():
        start = dt.datetime.strptime(r.window_start, "%Y-%m-%d %H:%M:%S")
        if start + dt.timedelta(hours=1) <= cutoff:
            want[(r.window_start, r.event_type)] = r.n_events
    assert got == want
    # overlap factor sanity on the closed subset: ~4x the tumbling counts
    assert sum(got.values()) > 3 * spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_session_windows_gap_semantics(spark, tmp_path, sink_name):
    rows = [
        # user 1: two bursts separated by > 30 min → two sessions
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),
        (1, "2024-01-01 11:30:00", 3.0),
        # user 2: one session
        (2, "2024-01-01 10:05:00", 4.0),
        # sentinel flush event: pushes the final watermark far enough that
        # every real session window is closed and emitted in append mode
        (99, "2024-01-01 20:00:00", 0.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "value"]).select(
        F.monotonically_increasing_id().alias("event_id"),
        F.unix_timestamp("ts_s").cast("long").alias("ts_sec"),
        "user_id",
        F.lit("click").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    ).withColumn("ts", (F.col("ts_sec") * F.lit(1_000_000_000)).cast("long")).drop("ts_sec")
    path = str(tmp_path / "events_sessions")
    df.write.parquet(path)

    from healthcare_aihw_etl_pipeline_spark.streaming.events import EVENTS_RAW_SCHEMA  # noqa: F401

    stream = read_event_stream(spark, path)
    run_to_memory(
        session_windows(stream, gap="30 minutes", watermark="1 hour"),
        sink_name,
        "append",
    )
    out = spark.table(sink_name).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2  # the >30min gap split the sessions
    assert len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r.session_start)
    assert first.n_events == 2 and first.session_value == 3.0


def test_dedup_within_watermark(spark, tmp_path, sink_name):
    base = [(i, f"2024-01-01 10:{i:02d}:00", i % 3, 1.0) for i in range(10)]
    dups = base[:4]  # replayed events with identical event_id
    df = spark.createDataFrame(base + dups, ["event_id", "ts_s", "user_id", "value"]).select(
        F.col("event_id").cast("long"),
        (F.unix_timestamp("ts_s").cast("long") * F.lit(1_000_000_000)).alias("ts"),
        F.col("user_id").cast("long"),
        F.lit("click").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    path = str(tmp_path / "events_dups")
    df.write.parquet(path)

    stream = read_event_stream(spark, path)
    run_to_memory(dedup_within_watermark(stream), sink_name, "append")
    out = spark.table(sink_name)
    assert out.count() == 10
    assert out.select("event_id").distinct().count() == 10


def test_user_running_totals_stateful(spark, sf_dir, events_stream_dir, sink_name):
    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(user_running_totals(stream), sink_name, "update")
    # final state per user (single trigger → one output row per user)
    got = {r.user_id: (r.n_events, r.total_value) for r in spark.table(sink_name).collect()}
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
        )
    )
    want = {r.user_id: (r.n, r.tv) for r in batch.collect()}
    assert got == want


def test_tws_processor_logic_matches_batch_fake_handle(spark, sf_dir):
    """Documented-equivalence rung behind the TWS env-gated skip (the
    r15 verdict's #8): drive the StatefulProcessor LOGIC directly with
    an in-memory fake of the named-value-state handle — the same
    init → getValueState, exists/get/update per-key protocol the TWS
    state server speaks — over the sf0.001 events split into 3
    interleaved micro-batch slices, and compare the LAST update-mode
    emission per user to the exact batch aggregate. This pins
    everything the skipped test pins except Spark's protobuf-framed
    state-server wire (the one seam that genuinely needs the
    dependency)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        _make_running_totals_processor,
    )

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    class _FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _FakeValueState())

    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "value")
        .collect()
    )
    slices = [raw[i::3] for i in range(3)]

    last_emit: dict[int, tuple[int, float]] = {}
    procs: dict[int, object] = {}
    Running = _make_running_totals_processor()
    for sl in slices:
        by_user: dict[int, list] = {}
        for r in sl:
            by_user.setdefault(r.user_id, []).append(r.value)
        for uid, vals in by_user.items():
            if uid not in procs:
                p = Running()
                p.init(_FakeHandle())
                procs[uid] = p
            pdf = pd.DataFrame({"value": pd.Series(vals, dtype="float64")})
            for out in procs[uid].handleInputRows((uid,), [pdf], None):
                last_emit[int(out["user_id"][0])] = (
                    int(out["n_events"][0]),
                    float(out["total_value"][0]),
                )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("tv"),
        )
    )
    want = {r.user_id: (r.n, r.tv) for r in batch.collect()}
    assert last_emit == want


def test_user_running_totals_tws_matches_groupstate(
    spark, events_stream_dir, sink_name
):
    """The transformWithStateInPandas twin must emit exactly the
    GroupState operator's final per-user state. Skipped where the
    container's protobuf can't run the TWS state server."""
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        tws_available,
        user_running_totals_tws,
    )

    if not tws_available():
        pytest.skip("google.protobuf unusable in this container (TWS state server)")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, events_stream_dir)
        run_to_memory(user_running_totals_tws(stream), sink_name, "update")
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.table(sink_name).collect()
        }
        sink2 = sink_name + "_gs"
        stream2 = read_event_stream(spark, events_stream_dir)
        run_to_memory(user_running_totals(stream2), sink2, "update")
        want = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.table(sink2).collect()
        }
        assert got == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_write_stream_parquet_exactly_once(spark, events_stream_dir, tmp_path):
    from healthcare_aihw_etl_pipeline_spark.streaming.events import write_stream_parquet

    out = str(tmp_path / "hourly_out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, events_stream_dir)
    q = write_stream_parquet(hourly_event_counts(stream), out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # restart over the same checkpoint with no new input: no duplicates
    q2 = write_stream_parquet(hourly_event_counts(stream), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_interval_join_matches_batch(spark, sf_dir, events_stream_dir, sink_name):
    """Stream-stream interval join (purchases ⋈ prior-30-min clicks):
    matched rows must equal the batch inner join exactly; null-extended
    (no-click) purchases emit only once the watermark proves no match can
    arrive, so they must be a subset of the batch no-click purchases and
    complete below the watermark cutoff."""
    import datetime as dt

    from healthcare_aihw_etl_pipeline_spark.streaming import (
        interval_join_clicks_to_purchases,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(
        interval_join_clicks_to_purchases(stream, watermark="2 hours"),
        sink_name,
        "append",
    )
    got = spark.table(sink_name).collect()
    got_matched = {
        (r.event_id, r.click_ts, r.click_value_cents) for r in got if r.click_ts
    }
    got_null = {r.event_id for r in got if r.click_ts is None}

    from healthcare_aihw_etl_pipeline_spark.plans.registry import cents

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        cents(F.col("value")).alias("click_value_cents"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") >= F.expr("p_ts - INTERVAL 30 MINUTES"))
        & (F.col("click_ts") < F.col("p_ts"))
    )
    batch = purchases.join(clicks, cond, "left").collect()
    want_matched = {
        (r.event_id, r.click_ts, r.click_value_cents) for r in batch if r.click_ts
    }
    want_null = {r.event_id for r in batch if r.click_ts is None}
    want_null_ts = {
        r.event_id: r.p_ts for r in batch if r.click_ts is None
    }

    assert got_matched == want_matched
    assert got_null <= want_null
    # Null-extended rows are final once the GLOBAL watermark passes the
    # purchase timestamp. With two withWatermark nodes (clicks, purchases)
    # the global watermark is the MIN across them: min(max click_ts,
    # max purchase ts) - delay. Everything comfortably below that (minus
    # the 30-min range slack Spark may conservatively add) must have
    # emitted.
    max_side = (
        events.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    cutoff = max_side - dt.timedelta(hours=2, minutes=30, seconds=1)
    overdue = {e for e, ts in want_null_ts.items() if ts < cutoff}
    assert overdue, "cutoff left no overdue purchases - test data too short"
    assert overdue <= got_null


def test_stream_upsert_partitions_idempotent(spark, sf_dir, events_stream_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: the streamed table
    equals the batch table, and a checkpointed restart with no new input
    changes nothing (idempotent at batch grain)."""
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        write_stream_upsert_partitions,
    )

    out = str(tmp_path / "by_type")
    ckpt = str(tmp_path / "ckpt_upsert")
    stream = read_event_stream(spark, events_stream_dir).select(
        "event_id", "event_type", "value"
    )
    q = write_stream_upsert_partitions(stream, out, ckpt, ["event_type"])
    q.awaitTermination(120)
    got = {
        (r.event_type, r.n)
        for r in spark.read.parquet(out).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    q2 = write_stream_upsert_partitions(stream, out, ckpt, ["event_type"])
    q2.awaitTermination(120)
    got2 = {
        (r.event_type, r.n)
        for r in spark.read.parquet(out).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got2 == want


@pytest.mark.slow  # ~27 s; default siblings:
# test_stream_upsert_partitions_idempotent +
# test_stream_upsert_partition_replace_guard (same upsert sink).
def test_stream_upsert_keyed_merge_across_batches(spark, tmp_path):
    """key_cols MERGE mode: a partition whose rows span several
    micro-batches keeps earlier batches' rows (keyless partition-replace
    would shrink it to the last batch), a re-sent key takes the newest
    value, and a checkpointed restart changes nothing."""
    import os

    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        write_stream_upsert_partitions,
    )

    src = tmp_path / "src"
    src.mkdir()
    cols = ["event_id", "event_type", "value"]
    batch1 = [(1, "click", 1.0), (4, "click", 4.0), (2, "view", 2.0)]
    batch2 = [(3, "click", 3.0), (1, "click", 9.9)]
    for i, rows in enumerate([batch1, batch2]):
        f = str(src / f"b{i}")
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(f)
        # Deterministic batch order: the file source orders by mtime.
        for name in os.listdir(f):
            os.utime(os.path.join(f, name), (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "merged")
    ckpt = str(tmp_path / "ckpt_merge")

    def start():
        stream = (
            spark.readStream.schema("event_id long, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        return write_stream_upsert_partitions(
            stream, out, ckpt, ["event_type"], key_cols=["event_id"]
        )

    start().awaitTermination(120)
    want = {(1, "click", 9.9), (4, "click", 4.0), (2, "view", 2.0), (3, "click", 3.0)}
    got = {
        (r.event_id, r.event_type, r.value)
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    start().awaitTermination(120)  # restart, no new input: fixed point
    got2 = {
        (r.event_id, r.event_type, r.value)
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == want


def test_stream_upsert_partition_replace_guard(spark, tmp_path):
    """verify_replace (default): a source that splits one partition
    across micro-batches FAILS LOUDLY in partition-replace mode instead
    of silently shrinking the partition to the last batch's rows."""
    import os

    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        write_stream_upsert_partitions,
    )

    src = tmp_path / "src_guard"
    src.mkdir()
    cols = ["event_id", "event_type", "value"]
    # Both batches write into the 'click' partition with disjoint rows —
    # exactly the shape the precondition forbids.
    batch1 = [(1, "click", 1.0), (2, "click", 2.0)]
    batch2 = [(3, "click", 3.0)]
    for i, rows in enumerate([batch1, batch2]):
        f = str(src / f"b{i}")
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(f)
        for name in os.listdir(f):
            os.utime(os.path.join(f, name), (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "guarded")
    ckpt = str(tmp_path / "ckpt_guard")
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = write_stream_upsert_partitions(stream, out, ckpt, ["event_type"])
    with pytest.raises(
        StreamingQueryException, match="partition-replace batch would lose rows"
    ):
        q.awaitTermination(120)


def test_stream_static_enrichment_matches_batch(
    spark, sf_dir, events_stream_dir, sink_name
):
    """Stream-static left join: every streamed event carries the dim
    attributes the batch join would give it — including NULL cohorts for
    users absent from the dim (late-arriving-dimension posture)."""
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
    from healthcare_aihw_etl_pipeline_spark.streaming import (
        enrich_with_user_dim,
        user_first_seen_dim,
    )

    dim = user_first_seen_dim(spark, sf_dir)
    # drop some users from the dim so the NULL path is exercised
    dim = dim.where(F.col("user_id") % 10 != 0)

    stream = read_event_stream(spark, events_stream_dir)
    enriched = enrich_with_user_dim(
        stream.select("event_id", "user_id"), dim
    )
    run_to_memory(enriched, sink_name, "append")
    got = {
        r.event_id: (r.user_id, r.first_seen, r.cohort)
        for r in spark.table(sink_name).collect()
    }

    batch_events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    want = {
        r.event_id: (r.user_id, r.first_seen, r.cohort)
        for r in batch_events.join(dim, "user_id", "left").collect()
    }
    assert len(got) == len(want) and got == want
    assert any(v[2] is None for v in got.values())  # NULL-dim path hit


# ---------------------------------------------------------------------------
# Late-data torture: out-of-order micro-batches crossing the watermark.
# Each file is one micro-batch (maxFilesPerTrigger=1, mtime-ordered), so
# watermark advancement between batches is deterministic and the
# dropped-row accounting can be asserted exactly.
# ---------------------------------------------------------------------------


def _write_microbatch(spark, dirpath, rows, seq):
    """Write `rows` [(event_id, ts_str, user_id, value)] as ONE parquet
    file inside `dirpath`."""
    import glob
    import os
    import shutil

    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "value"]
    ).select(
        F.col("event_id").cast("long"),
        (F.unix_timestamp("ts_s").cast("long") * F.lit(1_000_000_000)).alias("ts"),
        F.col("user_id").cast("long"),
        F.lit("click").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    stage = f"{dirpath}-stage{seq}"
    df.coalesce(1).write.parquet(stage)
    os.makedirs(dirpath, exist_ok=True)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    dest = os.path.join(dirpath, f"batch-{seq:03d}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(stage)


def _replay_batches(spark, tmp_path, batches, transform):
    """Deterministic micro-batch replay: land file i, run the stream to
    completion (availableNow) against ONE persistent checkpoint, stop,
    repeat. Each run sees exactly one new file, so batch boundaries —
    and therefore watermark advancement and state eviction — are exact,
    not dependent on the file source's listing order (mtime ordering
    proved non-deterministic under a single availableNow run). Returns
    the accumulated rows from the parquet sink."""
    src = str(tmp_path / "replay_src")
    ckpt = str(tmp_path / "replay_ckpt")
    sink = str(tmp_path / "replay_sink")
    for seq, rows in enumerate(batches, start=1):
        _write_microbatch(spark, src, rows, seq)
        stream = read_event_stream(spark, src)
        q = (
            transform(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []  # sink dir empty: nothing was ever emitted


def test_late_rows_below_watermark_are_dropped_from_closed_windows(spark, tmp_path):
    """A row arriving AFTER the watermark passed its window must not
    appear in the emitted aggregate — and the still-open final window
    must not be emitted at all. Exact accounting: the closed 10:00
    window counts its 2 on-time rows, never the late third."""
    rows = _replay_batches(
        spark,
        tmp_path,
        [
            # b1: two on-time rows in the 10:00 window
            [(1, "2024-01-01 10:15:00", 1, 1.0),
             (2, "2024-01-01 10:45:00", 1, 1.0)],
            # b2: advances watermark to 12:01 → the 10:00 window closes
            [(3, "2024-01-01 12:31:00", 1, 1.0)],
            # b3: id 4 is LATE (10:30 < watermark 12:01) → dropped; id 5 on time
            [(4, "2024-01-01 10:30:00", 1, 1.0),
             (5, "2024-01-01 12:45:00", 1, 1.0)],
        ],
        lambda s: hourly_event_counts(s, watermark="30 minutes"),
    )
    out = {r.window_start: r.n_events for r in rows}
    # the closed window holds exactly the on-time rows
    assert out.get("2024-01-01 10:00:00") == 2, out
    # the late row neither reopened the window nor spawned a new one
    assert "2024-01-01 10:30:00" not in out
    # the 12:00 window is still open at the final watermark (12:15) —
    # append mode must NOT emit it
    assert "2024-01-01 12:00:00" not in out, out


@pytest.mark.slow
def test_dedup_state_eviction_reemits_after_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops replays only while the key's
    state lives inside the watermark horizon. A duplicate arriving after
    eviction is re-emitted (the documented at-least-once-beyond-horizon
    policy), and a row below the watermark is dropped as late."""
    rows = _replay_batches(
        spark,
        tmp_path,
        [
            [(100, "2024-01-01 10:00:00", 1, 1.0)],
            # duplicate inside the horizon → dropped; 13:00 row pushes
            # the watermark to 12:30
            [(100, "2024-01-01 10:05:00", 1, 1.0),
             (101, "2024-01-01 13:00:00", 1, 1.0)],
            # id 100's state (last seen 10:00) was evicted at wm 12:30 →
            # its re-arrival ABOVE the watermark is emitted again; id 102
            # sits below the watermark → dropped as late data
            [(100, "2024-01-01 13:05:00", 1, 1.0),
             (102, "2024-01-01 10:00:00", 1, 1.0)],
        ],
        lambda s: dedup_within_watermark(s, watermark="30 minutes"),
    )
    ids = [r.event_id for r in rows]
    assert sorted(ids) == [100, 100, 101], ids


@pytest.mark.slow  # ~72 s; default sibling:
# test_session_windows_gap_semantics (same session-gap kernel).
def test_out_of_order_event_bridges_sessions_within_watermark(spark, tmp_path):
    """An out-of-order (but in-watermark) event landing in the gap
    between two provisional sessions must MERGE them into one — the
    session-window state is keyed by event time, not arrival order."""
    rows = _replay_batches(
        spark,
        tmp_path,
        [
            # b1: two bursts 50 min apart → provisionally TWO sessions
            [(1, "2024-01-01 10:00:00", 7, 1.0),
             (2, "2024-01-01 10:50:00", 7, 1.0)],
            # b2: 10:25 bridges the gap (25 min to each) → ONE session
            [(3, "2024-01-01 10:25:00", 7, 1.0)],
            # b3: sentinel pushes the watermark past the session's close
            [(99, "2024-01-01 14:00:00", 99, 0.0)],
        ],
        lambda s: session_windows(s, gap="30 minutes", watermark="1 hour"),
    )
    mine = [r for r in rows if r.user_id == 7]
    assert len(mine) == 1, mine
    assert mine[0].n_events == 3
    assert mine[0].session_start == "2024-01-01 10:00:00"
    assert mine[0].session_end == "2024-01-01 11:20:00"


def _tier():
    return (
        F.when(F.col("value") < 10.0, "low")
        .when(F.col("value") < 100.0, "mid")
        .otherwise("high")
        .alias("tier")
    )


def test_stream_scd2_batches_equal_full_history(spark, sf_dir, tmp_path):
    """Equivalence law: stitching any ts-ordered partition of the event
    log batch-by-batch (streaming/scd2.scd2_apply_batch) yields EXACTLY
    the batch operator's SCD2 history of the full log — intervals,
    closures, and is_current flags all included — and a redelivered
    batch_id is a no-op via the table's txn map (exactly-once)."""
    from healthcare_aihw_etl_pipeline_spark.operators.scd import scd2_history
    from healthcare_aihw_etl_pipeline_spark.sources.txlog import TxLogTable
    from healthcare_aihw_etl_pipeline_spark.streaming.scd2 import (
        scd2_apply_batch,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", _tier())
    )
    lo, hi = events.agg(
        F.min("ts").alias("a"), F.max("ts").alias("b")
    ).first()
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    batches = [
        events.where(F.col("ts") < cuts[0]),
        events.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        events.where(F.col("ts") >= cuts[1]),
    ]
    dim = TxLogTable(str(tmp_path / "scd2dim"))
    for i, b in enumerate(batches):
        scd2_apply_batch(
            dim, b, "user_id", "tier", "ts", "event_id",
            writer_id="scd2:test", batch_id=i,
        )
    got = sorted(
        tuple(r)
        for r in dim.snapshot(spark)
        .select("user_id", "tier", "valid_from", "valid_to", "is_current")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in scd2_history(events, "user_id", "tier", "ts", "event_id")
        .select("user_id", "tier", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert got == want
    assert any(r[4] for r in got)  # open intervals exist
    assert any(not r[4] for r in got)  # and closed history exists

    # Replay: redelivering the LAST batch_id must not change the
    # dimension — the txn map short-circuits it (a replayed batch is
    # NOT re-stitchable in general: its own events can precede the
    # open interval it advanced, which strict would rightly reject).
    scd2_apply_batch(
        dim, batches[2], "user_id", "tier", "ts", "event_id",
        writer_id="scd2:test", batch_id=2,
    )
    again = sorted(
        tuple(r)
        for r in dim.snapshot(spark)
        .select("user_id", "tier", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert again == got


def test_stream_scd2_strict_rejects_late_history(spark, tmp_path):
    """An event earlier than its key's open interval violates the
    in-order contract and must raise, not silently corrupt history."""
    import datetime as dt

    import pytest

    from healthcare_aihw_etl_pipeline_spark.sources.txlog import TxLogTable
    from healthcare_aihw_etl_pipeline_spark.streaming.scd2 import (
        scd2_apply_batch,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    dim = TxLogTable(str(tmp_path / "dim"))
    b1 = spark.createDataFrame(
        [(1, t(10), 1, "a")], "user_id int, ts timestamp_ntz, event_id int, tier string"
    )
    scd2_apply_batch(dim, b1, "user_id", "tier", "ts", "event_id")
    late = spark.createDataFrame(
        [(1, t(5), 2, "b")], "user_id int, ts timestamp_ntz, event_id int, tier string"
    )
    with pytest.raises(ValueError, match="earlier than its key"):
        scd2_apply_batch(dim, late, "user_id", "tier", "ts", "event_id")


def test_write_stream_scd2_end_to_end(spark, events_stream_dir, tmp_path):
    """The foreachBatch driver (write_stream_scd2) over the real file
    stream produces the batch history of everything it consumed."""
    from healthcare_aihw_etl_pipeline_spark.operators.scd import scd2_history
    from healthcare_aihw_etl_pipeline_spark.sources.txlog import TxLogTable
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        read_event_stream,
    )
    from healthcare_aihw_etl_pipeline_spark.streaming.scd2 import (
        write_stream_scd2,
    )

    stream = read_event_stream(spark, events_stream_dir).select(
        "user_id", "ts", "event_id", _tier()
    )
    dim = TxLogTable(str(tmp_path / "dim"))
    q = write_stream_scd2(
        stream, dim, "user_id", "tier", "ts", "event_id",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    batch = spark.read.parquet(f"{events_stream_dir}").select(
        "user_id", "ts", "event_id", _tier()
    )
    got = sorted(
        tuple(r)
        for r in dim.snapshot(spark)
        .select("user_id", "tier", "valid_from", "valid_to", "is_current")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in scd2_history(batch, "user_id", "tier", "ts", "event_id")
        .select("user_id", "tier", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert got == want


@pytest.mark.slow  # ~73 s; default sibling: the restart-idempotency
# test below replays the same monitor end-to-end against its own
# first-pass state (covers the kernel + sink contract).
def test_drift_monitor_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    """Streaming PSI drift monitor == batch twin on closed windows: the
    reference is the first half of the timeline, the stream's per-day
    windows are scored as the watermark closes them, and every emitted
    (window, key) row is bit-identical to psi_of_counts over the batch
    windowed aggregation restricted to the same closed-window subset."""
    import datetime as dt

    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
    from healthcare_aihw_etl_pipeline_spark.streaming.drift import (
        monitor_drift,
        psi_of_counts,
        reference_counts,
        windowed_bucket_counts,
    )

    batch_events = load_table(spark, sf_dir, "events")
    ref = reference_counts(
        batch_events.where(F.to_date("ts") < F.lit("2024-01-16"))
    )
    out = str(tmp_path / "psi-out")
    ckpt = str(tmp_path / "psi-ckpt")
    q = monitor_drift(
        read_event_stream(spark, events_stream_dir),
        ref,
        out,
        ckpt,
        available_now=True,
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.key): (r.n_buckets, r.psi_q, r.psi, r.drifted)
        for r in spark.read.parquet(out).collect()
    }
    cutoff = _max_event_ts(spark, sf_dir) - dt.timedelta(hours=2)
    closed = windowed_bucket_counts(batch_events).where(
        F.to_timestamp("window_start") + F.expr("INTERVAL 1 DAY")
        <= F.lit(cutoff)
    )
    want = {
        (r.window_start, r.key): (r.n_buckets, r.psi_q, r.psi, r.drifted)
        for r in psi_of_counts(closed, ref).collect()
    }
    assert want, "cutoff left no closed windows"
    assert got == want
    # sanity on the flag polarity: with ~tens of events per daily
    # window at this SF, per-day PSI jitters, but the flag must not be
    # stuck — both states appear across the emitted windows
    flags = {v[3] for v in want.values()}
    assert False in flags


def test_drift_monitor_restart_is_idempotent(spark, sf_dir, events_stream_dir, tmp_path):
    """Restart contract: re-starting the monitor on the same checkpoint
    with no new input is a fixed point (no duplicate scored rows), and
    the per-batch overwrite layout keeps (window, key) unique even
    across replays."""
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
    from healthcare_aihw_etl_pipeline_spark.streaming.drift import (
        monitor_drift,
        reference_counts,
    )

    ref = reference_counts(
        load_table(spark, sf_dir, "events").where(
            F.to_date("ts") < F.lit("2024-01-16")
        )
    )
    out = str(tmp_path / "psi-out")
    ckpt = str(tmp_path / "psi-ckpt")

    def run():
        q = monitor_drift(
            read_event_stream(spark, events_stream_dir), ref, out, ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

    run()
    first = sorted(
        (r.window_start, r.key, r.psi_q)
        for r in spark.read.parquet(out).collect()
    )
    run()  # restart, no new input
    second = sorted(
        (r.window_start, r.key, r.psi_q)
        for r in spark.read.parquet(out).collect()
    )
    assert first == second
    keys = [(w, k) for (w, k, _) in second]
    assert len(keys) == len(set(keys))


@pytest.mark.slow
def test_drift_monitor_late_data_accounting_matches_batch(spark, tmp_path):
    """Out-of-order replay for the PSI monitor: micro-batches arrive
    SHUFFLED in time, one late row lands below the watermark after its
    daily window closed. The monitor must (a) drop exactly that row,
    (b) emit each closed window once, and (c) produce scores bit-equal
    to the batch twin computed over the ON-TIME subset restricted to
    the closed windows — the watermark-drop accounting law.

    Margins are kept > 1 day on both sides of every boundary so the
    assertion is not sensitive to the exact >=/> watermark convention.
    """
    from healthcare_aihw_etl_pipeline_spark.streaming.drift import (
        monitor_drift,
        psi_of_counts,
        reference_counts,
        windowed_bucket_counts,
    )

    # Reference distribution for key 'click': buckets 0 and 1, 50/50.
    ref = reference_counts(
        spark.createDataFrame(
            [("click", float(v)) for v in [10] * 50 + [60] * 50],
            "event_type string, value double",
        )
    )

    src = str(tmp_path / "drift_src")
    ckpt = str(tmp_path / "drift_ckpt")
    out = str(tmp_path / "drift_out")

    # (event_id, ts, user, value): day-1 on-time rows (buckets 0,0,1),
    # then a batch whose max ts (Jan 3 06:00) pushes the watermark to
    # Jan 3 04:00 — far past the day-1 window end — THEN a late day-1
    # row arrives (dropped) alongside an out-of-order day-2 row (kept:
    # its window end Jan 3 00:00 is within... below the watermark?
    # No: day-2's window END (Jan 3 00:00) is BELOW the watermark only
    # after batch 2; Spark drops input rows whose window cannot accept
    # them — so place the kept out-of-order row in day 3 instead, far
    # above the watermark.)
    batches = [
        [(1, "2024-01-01 08:00:00", 1, 10.0),
         (2, "2024-01-01 12:00:00", 1, 10.0),
         (3, "2024-01-01 18:00:00", 1, 60.0)],
        # advances watermark to Jan 3 04:00 (2h delay): day-1 closes
        [(4, "2024-01-03 06:00:00", 1, 10.0)],
        # late day-1 row: window end Jan 2 00:00 << watermark -> DROPPED
        # out-of-order day-3 row (03:00 < the batch-2 row's hour): kept
        [(5, "2024-01-01 09:00:00", 1, 60.0),
         (6, "2024-01-03 03:00:00", 1, 60.0)],
        # sentinel closes day 3
        [(7, "2024-01-05 12:00:00", 1, 10.0)],
    ]
    for seq, rows in enumerate(batches, start=1):
        _write_microbatch(spark, src, rows, seq)
        q = monitor_drift(
            read_event_stream(spark, src), ref, out, ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

    got = {
        (r.window_start, r.key): (
            r.n_buckets, r.psi_q, r.drifted,
            r.unmatched_buckets, r.unmatched_mass,
        )
        for r in spark.read.parquet(out).collect()
    }
    # closed windows: day 1 and day 3 (day 5 still open at final
    # watermark Jan 5 10:00)
    assert set(got) == {
        ("2024-01-01 00:00:00", "click"),
        ("2024-01-03 00:00:00", "click"),
    }, got

    # batch twin over the ON-TIME subset (late row 5 excluded), same
    # closed-window restriction — bit-equal scores
    on_time = spark.createDataFrame(
        [r for b in batches for r in b if r[0] != 5],
        ["event_id", "ts_s", "user_id", "value"],
    ).select(
        F.to_timestamp("ts_s").cast("timestamp_ntz").alias("ts"),
        F.lit("click").alias("event_type"),
        "value",
    )
    closed = windowed_bucket_counts(on_time).where(
        F.col("window_start").isin(
            "2024-01-01 00:00:00", "2024-01-03 00:00:00"
        )
    )
    want = {
        (r.window_start, r.key): (
            r.n_buckets, r.psi_q, r.drifted,
            r.unmatched_buckets, r.unmatched_mass,
        )
        for r in psi_of_counts(closed, ref).collect()
    }
    assert got == want, (got, want)
    # sensitivity: had the late row counted, day-1 would score
    # differently — proves the dropped-row accounting is load-bearing
    with_late = spark.createDataFrame(
        [r for b in batches for r in b],
        ["event_id", "ts_s", "user_id", "value"],
    ).select(
        F.to_timestamp("ts_s").cast("timestamp_ntz").alias("ts"),
        F.lit("click").alias("event_type"),
        "value",
    )
    closed_late = windowed_bucket_counts(with_late).where(
        F.col("window_start") == "2024-01-01 00:00:00"
    )
    late_psi = {
        r.window_start: r.psi_q
        for r in psi_of_counts(closed_late, ref).collect()
    }
    assert (
        late_psi["2024-01-01 00:00:00"]
        != want[("2024-01-01 00:00:00", "click")][1]
    )


def test_tws_gate_matches_protobuf_importability():
    """TWS surface contract: transformWithStateInPandas is CONDITIONAL
    on google.protobuf (the state-server wire protocol). The gate must
    report exactly whether the dependency imports — no silent False in
    an equipped container, no True where the server would crash."""
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        tws_available,
    )

    try:
        import google.protobuf  # noqa: F401

        have = True
    except ImportError:
        have = False
    assert tws_available() is have


def test_daily_peak_concurrency_closes_day_with_tie_rule(spark, tmp_path):
    """Streaming sweep-line twin (round-11 family): the day emits
    EXACTLY ONCE when the watermark passes end-of-day, out-of-order
    arrival within the watermark widens spans instead of corrupting
    them, and the closed-interval tie rule is load-bearing — user 2's
    span STARTS at the instant user 1's span ends (12:30), so peak
    concurrency must be 2; an ends-first sweep would report 1."""
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        daily_peak_concurrency,
    )

    rows = _replay_batches(
        spark,
        tmp_path,
        [
            # b1: u1 at 12:30, u2 at 13:00 (u2's span will start 12:30)
            [(1, "2024-01-01 12:30:00", 1, 1.0),
             (2, "2024-01-01 13:00:00", 2, 1.0)],
            # b2: OUT-OF-ORDER u1 event at 10:00 (within the 6h
            # watermark) widens u1's span to [10:00, 12:30]; u2's
            # second event makes its span [12:30, 13:00]
            [(3, "2024-01-01 10:00:00", 1, 1.0),
             (4, "2024-01-01 12:30:00", 2, 1.0)],
            # b3: Jan 2 event raises max event time; watermark still
            # trails behind end-of-day-1 during this batch
            [(5, "2024-01-02 08:00:00", 9, 1.0)],
            # b4: watermark (08:00 - 6h = 02:00 Jan 2) now past
            # end-of-day-1 -> the day-1 state times out and emits
            [(6, "2024-01-02 09:00:00", 9, 1.0)],
        ],
        lambda s: daily_peak_concurrency(s, watermark="6 hours"),
    )
    done = [(r.day, r.n_sessions, r.max_concurrent) for r in rows]
    # day 1 emitted exactly once with the tie-inclusive peak; day 2
    # never closed (watermark never passed its end), so never emitted
    assert done == [("2024-01-01", 2, 2)], done


# ---------------------------------------------------------------------------
# Streaming FIFO return matching (round-12 twin of fifo_return_matching)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_LI_SCHEMA = (
    "l_partkey long, l_orderkey long, l_linenumber long, "
    "l_quantity double, l_returnflag string, l_shipdate timestamp"
)


def _replay_lineitem_batches(spark, tmp_path, batches, transform):
    """Lineitem flavour of _replay_batches: land one parquet file per
    micro-batch against a persistent checkpoint, availableNow each
    time, accumulate the parquet sink."""
    src = str(tmp_path / "li_src")
    ckpt = str(tmp_path / "li_ckpt")
    sink = str(tmp_path / "li_sink")
    for seq, rows in enumerate(batches, start=1):
        df = spark.createDataFrame(
            [
                (pk, ok, ln, float(q), fl, _dt.datetime.fromisoformat(sd))
                for (pk, ok, ln, q, fl, sd) in rows
            ],
            _LI_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .format("parquet")
            .load(src)
            .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        )
        q = (
            transform(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []


@pytest.mark.slow
def test_streaming_fifo_closes_part_once_with_out_of_order_lines(
    spark, tmp_path
):
    """The part emits EXACTLY ONCE when the watermark passes its last
    ship date + quiet horizon, and out-of-order arrival (an earlier
    shipment landing AFTER a later return was already seen) cannot
    change the allocation — state accumulation is order-insensitive,
    the FIFO order is reconstructed at close."""
    from healthcare_aihw_etl_pipeline_spark.streaming.fifo import (
        part_fifo_matching,
    )

    rows = _replay_lineitem_batches(
        spark,
        tmp_path,
        [
            # b1: part 100 first shipment + a return; part 200
            # supply-only (must close SILENTLY, like the batch join)
            [
                (100, 1, 1, 10, "N", "2024-01-01 00:00:00"),
                (100, 3, 1, 4, "R", "2024-01-05 00:00:00"),
                (200, 4, 1, 5, "N", "2024-01-02 00:00:00"),
            ],
            # b2: OUT-OF-ORDER: a Jan-2 shipment arrives after the
            # Jan-5 return; plus a later return
            [
                (100, 2, 1, 6, "N", "2024-01-02 00:00:00"),
                (100, 5, 1, 9, "R", "2024-01-08 00:00:00"),
            ],
            # b3: far-future line (part 300) pushes the watermark past
            # Jan-8 + 3d quiet -> parts 100 and 200 time out
            [(300, 9, 1, 1, "N", "2024-02-01 00:00:00")],
            # b4: one more future batch: NO second emission for 100
            [(300, 9, 2, 1, "N", "2024-02-02 00:00:00")],
        ],
        # watermark must cover the 3-day disorder of the Jan-2 line
        # arriving after Jan-5/Jan-8 were seen
        lambda s: part_fifo_matching(s, watermark="10 days", quiet_days=3),
    )
    got = [
        (r.partkey, r.n_lines, r.matched_qty, r.unmatched_qty, r.qty_age_days)
        for r in rows
    ]
    # FIFO: demand Jan5 x4 <- (Jan1, age 4); demand Jan8 x9 <- 6 from
    # Jan1 (age 7) + 3 from Jan2 (age 6): matched 13, age 16+42+18 = 76
    assert got == [(100, 4, 13, 0, 76)], got


@pytest.mark.slow
def test_streaming_fifo_replay_equals_batch_alloc_on_corpus(
    spark, tmp_path
):
    """Full-corpus replay equivalence: sf0.001 lineitem split into 3
    ROUND-ROBIN slices (ship/return lines interleave across batches in
    arbitrary time order), plus a sentinel far-future line to close
    every part — the emitted relation must equal the shared batch
    operator fifo_interval_alloc row-for-row."""
    from healthcare_aihw_etl_pipeline_spark.operators.fifo import (
        fifo_interval_alloc,
    )
    from healthcare_aihw_etl_pipeline_spark.streaming.fifo import (
        part_fifo_matching,
    )

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_partkey", "l_orderkey", "l_linenumber",
            "l_quantity", "l_returnflag",
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        )
    )
    raw = li.collect()
    slices = [raw[i::3] for i in range(3)]
    # round-robin slices interleave the corpus's ~7-year date span
    # arbitrarily, so the watermark delay must cover the WHOLE span
    # (4000 days) for zero drops; the sentinel then needs to clear
    # delay + quiet to close every real part
    horizon = max(r.l_shipdate for r in raw) + _dt.timedelta(days=4200)
    batches = [
        [
            (r.l_partkey, r.l_orderkey, r.l_linenumber, r.l_quantity,
             r.l_returnflag, r.l_shipdate.isoformat(sep=" "))
            for r in sl
        ]
        for sl in slices
    ]
    batches.append(
        [(999_999_999, 1, 1, 1, "N", horizon.isoformat(sep=" "))]
    )
    rows = _replay_lineitem_batches(
        spark,
        tmp_path,
        batches,
        lambda s: part_fifo_matching(s, watermark="4000 days", quiet_days=7),
    )
    got = {
        r.partkey: (r.matched_qty, r.unmatched_qty, r.qty_age_days)
        for r in rows
        if r.partkey != 999_999_999
    }
    want = {
        r.partkey: (r.matched_qty, r.unmatched_qty, r.qty_age_days)
        for r in fifo_interval_alloc(li).collect()
    }
    assert got == want
    # every streamed part emitted exactly once
    assert len([r for r in rows if r.partkey != 999_999_999]) == len(got)


# ---------------------------------------------------------------------------
# Streaming fused sweep profile (round-12 twin of interval_sweep_profile)


@pytest.mark.slow  # ~90 s; default siblings: daily_peak_concurrency
# tie-rule test (same streaming sweep kernel) + the batch
# test_sweep_bucketed_equals_legacy equality over all consumers.
def test_daily_sweep_profile_matches_batch_on_closed_day(spark, tmp_path):
    """The streaming fused sweep must emit, for the watermark-closed
    day, EXACTLY the row the batch interval_sweep_profile computes for
    that day over the same events — including the closed-interval tie
    rule and the Fubini identity — with out-of-order arrival widening
    spans instead of corrupting them."""
    from healthcare_aihw_etl_pipeline_spark.streaming.events import (
        daily_sweep_profile,
    )

    batches = [
        # u1 span will be [10:00, 12:30]; u2 span [12:30, 13:00]
        [(1, "2024-01-01 12:30:00", 1, 1.0),
         (2, "2024-01-01 13:00:00", 2, 1.0)],
        # out-of-order widening + u2's start arriving late
        [(3, "2024-01-01 10:00:00", 1, 1.0),
         (4, "2024-01-01 12:30:00", 2, 1.0)],
        # u3: a zero-length span (single event) at 11:00
        [(5, "2024-01-01 11:00:00", 3, 1.0)],
        # next-day events advance the watermark past end-of-day-1
        [(6, "2024-01-02 08:00:00", 9, 1.0)],
        [(7, "2024-01-02 09:00:00", 9, 1.0)],
    ]
    rows = _replay_batches(
        spark,
        tmp_path,
        batches,
        lambda s: daily_sweep_profile(s, watermark="6 hours"),
    )
    got = [
        (r.day, r.n_sessions, r.max_concurrent, r.covered_us,
         r.total_session_us, r.user_us_integral)
        for r in rows
    ]
    # batch twin over the same rows, restricted to the closed day
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(
        all_rows, ["event_id", "ts_s", "user_id", "value"]
    ).select(
        F.col("user_id").cast("long"),
        F.to_timestamp("ts_s").alias("ts"),
    )
    from healthcare_aihw_etl_pipeline_spark.operators.sweep import (
        sweep_day_profile,
    )

    want = [
        (r.day, r.n_sessions, r.max_concurrent, r.covered_us,
         r.total_session_us, r.user_us_integral)
        for r in sweep_day_profile(df).collect()
        if r.day == "2024-01-01"
    ]
    assert got == want, (got, want)
    # day emitted exactly once, identities hold
    assert len(got) == 1
    day, n, peak, covered, total, integral = got[0]
    assert integral == total  # Fubini identity
    assert covered <= total  # the union cannot exceed the span sum
    assert n == 3 and peak == 2  # closed-interval tie rule at 12:30


@pytest.mark.slow
def test_streaming_fifo_late_older_line_does_not_regress_timeout(
    spark, tmp_path
):
    """A late-but-admitted OLDER line must not pull the part's quiet
    horizon backwards: the timeout is max over ALL accumulated ship
    instants + quiet, so the part stays open until (true last ship +
    quiet) and emits exactly once with every line included. (Timeouts
    evaluate against the batch-END watermark, and lines older than
    watermark-delay are dropped — the dates below respect both.)"""
    from healthcare_aihw_etl_pipeline_spark.streaming.fifo import (
        part_fifo_matching,
    )

    transform = lambda s: part_fifo_matching(  # noqa: E731
        s, watermark="10 days", quiet_days=3
    )
    batches = [
        # b1: last ship Apr 22 -> horizon Apr 25 (wm after b1: Apr 12)
        [
            (100, 1, 1, 5, "N", "2024-04-20 00:00:00"),
            (100, 2, 1, 2, "R", "2024-04-22 00:00:00"),
        ],
        # b2: LATE older line (Apr 14, above the Apr 12 watermark). A
        # per-batch max would regress the horizon to Apr 17.
        [(100, 3, 1, 1, "N", "2024-04-14 00:00:00")],
        # b3: sentinel -> wm Apr 22 at batch end: inside (Apr 17,
        # Apr 25), so a regressed timeout fires HERE; the correct one
        # must not
        [(300, 9, 1, 1, "N", "2024-05-02 00:00:00")],
    ]
    rows3 = _replay_lineitem_batches(spark, tmp_path, batches, transform)
    assert [r for r in rows3 if r.partkey == 100] == [], rows3
    # b4: wm Apr 28 > Apr 25 -> exactly one emission with ALL THREE
    # lines (the late line takes its proper FIFO position)
    batches.append([(300, 9, 2, 1, "N", "2024-05-08 00:00:00")])
    rows4 = _replay_lineitem_batches(
        spark, tmp_path / "second", batches, transform
    )
    got = [
        (r.n_lines, r.matched_qty, r.unmatched_qty, r.qty_age_days)
        for r in rows4
        if r.partkey == 100
    ]
    # FIFO: demand 2@Apr22 <- 1 from Apr14 (age 8) + 1 from Apr20
    # (age 2) = 10 quantity-age-days
    assert got == [(3, 2, 0, 10)], got


# ---------------------------------------------------------------------------
# Streaming incremental dedup (round-13 twin of incremental_dedup)

_DOC_SCHEMA = (
    "doc_id long, source string, text string, is_new boolean, "
    "ingest_ts timestamp"
)


def _replay_doc_batches(spark, tmp_path, batches, transform):
    """Documents flavour of _replay_lineitem_batches: one parquet file
    per micro-batch, persistent checkpoint, availableNow each time."""
    src = str(tmp_path / "doc_src")
    ckpt = str(tmp_path / "doc_ckpt")
    sink = str(tmp_path / "doc_sink")
    for rows in batches:
        df = spark.createDataFrame(
            [
                (d, s, t, bool(n), _dt.datetime.fromisoformat(ts))
                for (d, s, t, n, ts) in rows
            ],
            _DOC_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            transform(
                spark.readStream.schema(spark.read.parquet(src).schema)
                .format("parquet")
                .load(src)
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []


@pytest.mark.slow
def test_streaming_dedup_base_after_new_flips_and_emits_once(
    spark, tmp_path
):
    """A base document landing AFTER its new duplicates were seen must
    still flip them to dup_base (order-insensitive state), every hash
    emits exactly once at close, and base-only hashes close silently."""
    from healthcare_aihw_etl_pipeline_spark.streaming.dedup import (
        incremental_dedup_stream,
    )

    rows = _replay_doc_batches(
        spark,
        tmp_path,
        [
            # b1: two NEW holders of text 'aaa', one NEW holder of 'bbb'
            [
                (9, "s2", "aaa", True, "2024-01-01 00:00:00"),
                (3, "s1", "aaa", True, "2024-01-02 00:00:00"),
                (6, "s1", "bbb", True, "2024-01-01 12:00:00"),
            ],
            # b2: OUT-OF-ORDER base 'aaa' arrives after the new docs;
            # a second NEW holder of 'bbb'; a base-only text 'ccc'
            [
                (1, "s0", "aaa", False, "2024-01-01 06:00:00"),
                (12, "s2", "bbb", True, "2024-01-03 00:00:00"),
                (2, "s0", "ccc", False, "2024-01-02 00:00:00"),
            ],
            # b3: far-future sentinel pushes the watermark past every
            # hash's last-seen + quiet -> all close
            [(999, "sx", "zzz-sentinel", False, "2024-02-01 00:00:00")],
            # b4: one more future batch: NO second emission
            [(998, "sx", "zzz-sentinel-2", False, "2024-02-02 00:00:00")],
        ],
        lambda s: incremental_dedup_stream(
            s, watermark="10 days", quiet_days=3
        ),
    )
    got = sorted((r.doc_id, r.source, r.verdict) for r in rows)
    assert got == [
        (3, "s1", "dup_base"),
        (6, "s1", "kept"),
        (9, "s2", "dup_base"),
        (12, "s2", "within_dup"),
    ], got


@pytest.mark.slow  # ~63 s; default sibling: test_dedup_within_watermark
# (same keyed-dedup kernel, synthetic stream).
def test_streaming_dedup_replay_equals_batch_on_corpus(spark, tmp_path):
    """Full-corpus replay equivalence: sf0.001 documents split into 3
    ROUND-ROBIN slices with synthetic ingest times (epoch + doc_id
    seconds), sentinel closes every hash — the emitted per-document
    verdicts must aggregate to the batch incremental_dedup query's
    per-source counts row-for-row."""
    from collections import Counter

    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY
    from healthcare_aihw_etl_pipeline_spark.streaming.dedup import (
        incremental_dedup_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    raw = docs.collect()
    epoch = _dt.datetime(2024, 1, 1)
    slices = [raw[i::3] for i in range(3)]
    batches = [
        [
            (
                r.doc_id,
                r.source,
                r.text,
                r.doc_id % 3 == 0,
                (epoch + _dt.timedelta(seconds=r.doc_id)).isoformat(sep=" "),
            )
            for r in sl
        ]
        for sl in slices
    ]
    batches.append(
        [(10**9, "sx", "zzz-sentinel", False, "2024-03-01 00:00:00")]
    )
    rows = _replay_doc_batches(
        spark,
        tmp_path,
        batches,
        lambda s: incremental_dedup_stream(s, watermark="2 days", quiet_days=7),
    )
    agg: dict = {}
    for r in rows:
        if r.doc_id == 10**9:
            continue
        c = agg.setdefault(r.source, Counter())
        c["n_new"] += 1
        c[r.verdict] += 1
    got = {
        s: (c["n_new"], c["dup_base"], c["within_dup"], c["kept"])
        for s, c in agg.items()
    }
    want = {
        r.source: (r.n_new, r.n_dup_vs_base, r.n_within_dup, r.n_kept)
        for r in REGISTRY["incremental_dedup"].build(spark, SF_DIR).collect()
    }
    assert got == want
    # exactly-once: one verdict per new document
    n_new_docs = len([r for r in raw if r.doc_id % 3 == 0])
    assert len([r for r in rows if r.doc_id != 10**9]) == n_new_docs


def test_sprt_monitor_matches_batch_on_closed_days(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """Streaming SPRT evidence == the batch daily relation on closed
    days, and the shared decision surface over the emitted evidence ==
    the batch decision restricted to the same closed-day subset
    (decisions need the full prefix, so the comparison holds the
    evidence set fixed)."""
    import datetime as dt

    from healthcare_aihw_etl_pipeline_spark.plans.round13b_queries import (
        _sprt_surface,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
    from healthcare_aihw_etl_pipeline_spark.streaming.sprt import (
        daily_conversions,
        monitor_sprt,
    )

    out = str(tmp_path / "sprt-out")
    ckpt = str(tmp_path / "sprt-ckpt")
    q = monitor_sprt(
        read_event_stream(spark, events_stream_dir),
        out,
        ckpt,
        available_now=True,
    )
    q.awaitTermination(120)
    emitted = spark.read.parquet(out)
    got_daily = {
        (r.day, r.variant): (r.n, r.x) for r in emitted.collect()
    }
    cutoff = _max_event_ts(spark, sf_dir) - dt.timedelta(hours=2)
    closed = daily_conversions(load_table(spark, sf_dir, "events")).where(
        F.to_timestamp("day") + F.expr("INTERVAL 1 DAY") <= F.lit(cutoff)
    )
    want_daily = {
        (r.day, r.variant): (r.n, r.x) for r in closed.collect()
    }
    assert want_daily, "cutoff left no closed days"
    assert got_daily == want_daily
    # exactly-once: (day, variant) unique across all emitted batches
    assert emitted.count() == emitted.select("day", "variant").distinct().count()
    # decision parity on the same evidence
    got = sorted(map(tuple, _sprt_surface(emitted).collect()))
    want = sorted(map(tuple, _sprt_surface(closed).collect()))
    assert got == want and len(got) == 2
