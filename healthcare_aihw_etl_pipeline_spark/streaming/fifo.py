"""Streaming FIFO return matching — the stateful twin of the batch
``fifo_return_matching`` / ``operators.fifo.fifo_interval_alloc``.

Shape (the ``daily_peak_concurrency`` pattern, SURVEY §2.11): a FIFO
allocation cannot be expressed as a streaming windowed aggregate — it
needs the part's complete line multiset in ship-date order — so the
state per part is the line table itself (parallel arrays, bounded by
LINES PER PART, a data-model bound like users-per-day, not a stream
bound), and the O(n log n) two-pointer FIFO resolution runs once at
close, in the Arrow batch handler, on metadata-sized state.

Out-of-order arrival within the watermark is handled BY CONSTRUCTION:
state accumulation is order-insensitive (append-only; the resolution
sorts by the total FIFO order (shipdate, orderkey, linenumber) at
close), so any batch split of the same lines — interleaved, reversed,
late-but-admitted — yields the identical emission. That is the exact
property the replay tests assert, and the reason this twin keeps the
sequential-loop formulation (property-tested equal to the batch
interval algebra in tests/test_round11b_ops.py) rather than
re-deriving cumulative intervals incrementally.

Close semantics: a part emits EXACTLY ONCE, when the event-time
watermark passes (last ship date seen for the part) + ``quiet``
— the part has gone quiet. The timeout epoch is computed explicitly in
UTC (naive ``datetime.timestamp()`` would shift by the worker's OS
timezone — the round-12 fix applied to daily_peak_concurrency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Emission schema: the shared alloc relation columns plus the line
# count (free from the state table; useful for monitoring).
OUT_SCHEMA = T.StructType(
    [
        T.StructField("partkey", T.LongType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("matched_qty", T.LongType()),
        T.StructField("unmatched_qty", T.LongType()),
        T.StructField("qty_age_days", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sus", T.ArrayType(T.LongType())),  # ship epoch µs
        T.StructField("okey", T.ArrayType(T.LongType())),
        T.StructField("lnum", T.ArrayType(T.LongType())),
        T.StructField("qty", T.ArrayType(T.LongType())),
        T.StructField("ret", T.ArrayType(T.LongType())),  # 1 = return
    ]
)

_DAY_US = 86_400_000_000


def _resolve_fifo(rows):
    """Sequential FIFO matching over (sus, okey, lnum, qty, ret) rows:
    sort by the total FIFO order — the full µs ship instant, so ties
    and sub-day orderings match the batch window's timestamp sort —
    then two-pointer demand-vs-supply. Ages are calendar-day diffs
    (UTC day truncation of the µs epoch == datediff of the date
    parts). Equal to the batch interval algebra (property-tested)."""
    rows = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    supply = [(r[0] // _DAY_US, r[3]) for r in rows if r[4] == 0]
    demand = [(r[0] // _DAY_US, r[3]) for r in rows if r[4] == 1]
    if not supply or not demand:
        return None
    total_demand = sum(q for _, q in demand)
    matched = 0
    qty_age = 0
    si = 0
    s_rem = supply[0][1] if supply else 0
    for dday, dqty in demand:
        need = dqty
        while need > 0 and si < len(supply):
            take = min(need, s_rem)
            if take > 0:
                matched += take
                qty_age += take * (dday - supply[si][0])
                need -= take
                s_rem -= take
            if s_rem == 0:
                si += 1
                s_rem = supply[si][1] if si < len(supply) else 0
        if si >= len(supply):
            break
    return len(rows), matched, total_demand - matched, qty_age


def part_fifo_matching(
    lines: DataFrame,
    watermark: str = "2 days",
    quiet_days: int = 7,
) -> DataFrame:
    """Streaming per-part FIFO allocation, emitted exactly once per
    part when the watermark passes its last ship date + ``quiet_days``.

    ``lines`` is a streaming lineitem relation (l_partkey, l_orderkey,
    l_linenumber, l_quantity, l_returnflag, l_shipdate). Parts with
    lines on only one side (no shipment or no return) close silently —
    matching the batch alloc relation, whose demand-supply join never
    sees them.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    empty = pd.DataFrame(
        {
            "partkey": pd.Series(dtype="int64"),
            "n_lines": pd.Series(dtype="int64"),
            "matched_qty": pd.Series(dtype="int64"),
            "unmatched_qty": pd.Series(dtype="int64"),
            "qty_age_days": pd.Series(dtype="int64"),
        }
    )

    def update(key, pdfs, state: GroupState):
        partkey = int(key[0])
        if state.hasTimedOut:
            sday, okey, lnum, qty, ret = state.get
            out = _resolve_fifo(list(zip(sday, okey, lnum, qty, ret)))
            state.remove()
            if out is None:
                yield empty
                return
            n_lines, matched, unmatched, qty_age = out
            yield pd.DataFrame(
                {
                    "partkey": [partkey],
                    "n_lines": [n_lines],
                    "matched_qty": [matched],
                    "unmatched_qty": [unmatched],
                    "qty_age_days": [qty_age],
                }
            )
            return
        acc = (
            [list(c) for c in state.get] if state.exists else [[], [], [], [], []]
        )
        for pdf in pdfs:
            us = pdf["l_shipdate"].astype("datetime64[ns]").astype("int64") // 1000
            acc[0].extend(int(v) for v in us)
            acc[1].extend(int(v) for v in pdf["l_orderkey"])
            acc[2].extend(int(v) for v in pdf["l_linenumber"])
            acc[3].extend(int(v) for v in pdf["l_quantity"])
            acc[4].extend(
                1 if f == "R" else 0 for f in pdf["l_returnflag"]
            )
        state.update(tuple(acc))
        # Event-time timeout: (last ship instant seen) + quiet horizon.
        # The max is over the WHOLE accumulated state, not the current
        # batch — a late-but-admitted OLDER line must not regress the
        # timeout and close the part early (which would split its
        # emission). µs epochs are timezone-free integers; no
        # naive-datetime round-trip, so no OS-timezone dependence.
        last_us = max(acc[0])
        timeout_ms = last_us // 1000 + quiet_days * 86_400_000
        state.setTimeoutTimestamp(timeout_ms)
        yield empty

    return (
        lines
        # only the two legs the allocation defines: N = shipment
        # supply, R = return demand (TPC-H also carries flag 'A',
        # which the batch operator's leg filters exclude)
        .where(F.col("l_returnflag").isin("N", "R"))
        .withWatermark("l_shipdate", watermark)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("l_quantity"),
            "l_returnflag",
            "l_shipdate",
        )
        .groupBy("l_partkey")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
