"""Streaming as-of enrichment — the stateful twin of the batch
single-scan self-as-of (``operators/asof.py::asof_self_join``), which
closes batch↔stream parity for the attribution stack the way
streaming/fifo.py did for interval allocation.

Shape (SURVEY §2.11): for every LEFT event (click) attach the
most-recent prior-or-equal RIGHT event (purchase) of the same user —
DuckDB ASOF LEFT JOIN semantics, ``right.ts <= left.ts`` inclusive.
A click cannot be finalized at arrival: a late-but-admitted purchase
with a smaller timestamp may still become its match. So the state per
user is

- ``carry_us``   ONE long: the greatest purchase instant already
                 folded behind the watermark (the last-right-row
                 carry — this is the whole state once the stream has
                 drained, and the reason state stays bounded forever),
- ``click_us``   pending clicks with ts still above the watermark,
- ``purch_us``   pending purchases with ts still above the watermark,

and emission is WATERMARK-driven: when the event-time watermark passes
a pending click's instant, no earlier right row can arrive any more
(Spark drops later-than-watermark input before the handler sees it),
so the click's match is decided — max over the carry and the pending
purchases at-or-before it — and the click emits EXACTLY ONCE. Pending
purchases behind the watermark fold into the single carry long.
Buffers are bounded by the watermark horizon (events per user per
delay window), never by stream length; the carry is one long forever.

State accumulation is order-insensitive BY CONSTRUCTION (append +
close-time max), so any batch split of the same events — interleaved,
reversed, late-but-admitted — emits the identical relation: the exact
property the replay test asserts against the batch operator.

Timestamps travel as timezone-free integer microseconds end-to-end
(the daily_peak_concurrency UTC discipline); the emitted relation is
(user_id, ts_us, asof_us) with asof_us NULL when no prior purchase
exists, exactly the batch operator's NULL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

def split_at_watermark(carry, clicks, purchases, wm_us):
    """Pure state-transition kernel of the streaming as-of (module
    level so the watermark boundary is unit-testable without a
    streaming harness): split buffers at the watermark — clicks
    STRICTLY behind it are decided, purchases strictly behind it fold
    into the carry. Returns (emitted [(click_us, asof_us)], new
    (carry, clicks, purchases)).

    Strictly-below, not at-or-below, on both splits. Measured on this
    Spark version the late filter actually drops input with
    ts <= watermark (only strictly-newer rows are admitted — probed
    with an offset ladder around an exact watermark), under which
    at-or-below finalization would also be safe; strictly-below keeps
    the operator correct under EITHER filter semantics (a version
    admitting ts == wm would otherwise miss the inclusive
    right.ts <= left.ts match at the knife edge). ``carry`` is None
    when no purchase has folded yet — a real sentinel rather than -1,
    so legitimate pre-epoch purchases (negative microseconds) survive
    the fold exactly as the batch operator handles them."""
    done = sorted(c for c in clicks if c < wm_us)
    rest_clicks = [c for c in clicks if c >= wm_us]
    behind = [p for p in purchases if p < wm_us]
    rest_purch = [p for p in purchases if p >= wm_us]
    out = []
    for c in done:
        cand = [p for p in behind if p <= c]
        if carry is not None:
            cand.append(carry)
        out.append((c, max(cand) if cand else None))
    if behind:
        new_carry = max(behind) if carry is None else max([carry] + behind)
    else:
        new_carry = carry
    return out, (new_carry, rest_clicks, rest_purch)


OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("asof_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("carry_us", T.LongType()),
        T.StructField("click_us", T.ArrayType(T.LongType())),
        T.StructField("purch_us", T.ArrayType(T.LongType())),
    ]
)


def asof_click_purchase_stream(
    events: DataFrame,
    watermark: str = "2 days",
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """Streaming most-recent-prior enrichment of ``left_type`` events
    with ``right_type`` instants per user.

    ``events`` is a streaming relation with ``user_id`` (long), ``ts``
    (timestamp) and ``event_type`` (string). Other event types pass
    through the watermark but carry no state cost (filtered before the
    stateful operator). Returns the append-mode relation
    (user_id, ts_us, asof_us)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "ts_us": pd.Series(dtype="int64"),
            "asof_us": pd.array([], dtype="Int64"),
        }
    )

    def _emit_closed(uid, carry, clicks, purchases, wm_us):
        """Pandas wrapper over :func:`split_at_watermark` (which holds
        the boundary semantics and their rationale)."""
        out_rows, new_state = split_at_watermark(
            carry, clicks, purchases, wm_us
        )
        df = (
            pd.DataFrame(
                {
                    "user_id": [uid for _ in out_rows],
                    "ts_us": [r[0] for r in out_rows],
                    "asof_us": pd.array(
                        [r[1] for r in out_rows], dtype="Int64"
                    ),
                }
            )
            if out_rows
            else empty
        )
        return df, new_state

    def update(key, pdfs, state: GroupState):
        (uid,) = key
        # None = "no purchase folded yet": a real sentinel rather
        # than -1, so legitimate pre-epoch purchases (negative
        # microseconds) survive the carry — the batch operator
        # handles negative timestamps, and so must the twin.
        carry, clicks, purchases = (
            state.get if state.exists else (None, [], [])
        )
        clicks, purchases = list(clicks), list(purchases)
        if not state.hasTimedOut:
            for pdf in pdfs:
                us = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64")
                    // 1000
                )
                is_left = pdf["event_type"] == left_type
                clicks.extend(int(v) for v in us[is_left])
                purchases.extend(int(v) for v in us[~is_left])
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, (carry, clicks, purchases) = _emit_closed(
            uid, carry, clicks, purchases, wm_us
        )
        if clicks or purchases or carry is not None:
            state.update((carry, clicks, purchases))
            if clicks or purchases:
                # wake when the watermark passes the earliest pending
                # instant (must be strictly above the current
                # watermark): pending clicks finalize and emit, and
                # pending purchases fold into the carry long — without
                # the purchase wake-up, a user whose stream ends in
                # purchases would hold a buffer forever instead of the
                # documented one-long carry
                nxt_ms = min(clicks + purchases) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(nxt_ms, state.getCurrentWatermarkMs() + 1)
                )
            # carry-only state persists with NO timeout: one long per
            # user, matched instantly by any future click
        else:
            state.remove()
        yield out

    filtered = (
        events.withWatermark("ts", watermark)
        .where(F.col("event_type").isin(left_type, right_type))
        .select("user_id", "ts", "event_type")
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
