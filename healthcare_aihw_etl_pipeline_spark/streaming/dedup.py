"""Streaming incremental dedup — the stateful twin of the batch
``incremental_dedup`` registry query (plans/llm_queries.py): documents
arrive continuously (the daily-ingest shape), and every NEW document is
classified exactly once as

- ``dup_base``    its text hash exists in the already-ingested base,
- ``within_dup``  no base holder, but another new document with the
                  same hash is the keeper,
- ``kept``        the first new holder of the hash.

Shape (the streaming/fifo.py pattern, SURVEY §2.11): "first new
holder" is min(doc_id) over the hash's new documents — a property of
the hash's complete document set, not of arrival order — so the state
per text hash is the compact document list itself ((doc_id, source)
pairs plus a has_base flag; bounded by DUPLICATES PER HASH, a
data-model bound), and the resolution runs once at close. State
accumulation is order-insensitive BY CONSTRUCTION: a base document
landing after its new duplicates were already seen still flips them to
``dup_base``, and any batch split of the same documents yields the
identical emission — exactly what the replay tests assert.

Close semantics: a hash emits EXACTLY ONCE, when the event-time
watermark passes (last ingest instant seen for the hash) +
``quiet_days``. The timeout is recomputed from the FULL accumulated
state (a late-but-admitted older row must not regress the horizon —
the round-12 applyInPandasWithState lesson), and µs epochs stay
timezone-free integers end-to-end. Hashes with no new documents close
silently, like the batch query's ``WHERE is_new``.

The batch query remains the oracle path: the replay test splits the
documents corpus into round-robin micro-batches and asserts the
emitted per-document verdicts aggregate to the batch query's
per-source counts row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("verdict", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_base", T.LongType()),
        T.StructField("new_ids", T.ArrayType(T.LongType())),
        T.StructField("new_sources", T.ArrayType(T.StringType())),
        T.StructField("seen_us", T.ArrayType(T.LongType())),
    ]
)


def incremental_dedup_stream(
    docs: DataFrame,
    watermark: str = "2 days",
    quiet_days: int = 7,
) -> DataFrame:
    """Streaming per-hash dedup verdicts, emitted exactly once per text
    hash when the watermark passes its last ingest instant +
    ``quiet_days``.

    ``docs`` is a streaming documents relation with ``doc_id`` (long),
    ``source`` (string), ``text`` (string), ``is_new`` (boolean) and
    ``ingest_ts`` (timestamp). Base rows (is_new = false) only set the
    hash's base flag — they are never emitted, mirroring the batch
    query's per-source accounting of NEW rows only.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "source": pd.Series(dtype="object"),
            "verdict": pd.Series(dtype="object"),
        }
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            has_base, new_ids, new_sources, _seen = state.get
            state.remove()
            if not new_ids:
                yield empty
                return
            keeper = min(new_ids)
            verdicts = [
                "dup_base"
                if has_base
                else ("kept" if d == keeper else "within_dup")
                for d in new_ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": list(new_ids),
                    "source": list(new_sources),
                    "verdict": verdicts,
                }
            )
            return
        has_base, new_ids, new_sources, seen_us = (
            state.get if state.exists else (0, [], [], [])
        )
        new_ids, new_sources, seen_us = (
            list(new_ids),
            list(new_sources),
            list(seen_us),
        )
        for pdf in pdfs:
            us = (
                pdf["ingest_ts"].astype("datetime64[ns]").astype("int64")
                // 1000
            )
            seen_us.extend(int(v) for v in us)
            for d, s, new in zip(pdf["doc_id"], pdf["source"], pdf["is_new"]):
                if bool(new):
                    new_ids.append(int(d))
                    new_sources.append(str(s))
                else:
                    has_base = 1
        state.update((int(has_base), new_ids, new_sources, seen_us))
        # Event-time timeout from the WHOLE accumulated state: a late
        # older row must not regress the horizon.
        timeout_ms = max(seen_us) // 1000 + quiet_days * 86_400_000
        state.setTimeoutTimestamp(timeout_ms)
        yield empty

    return (
        docs.withWatermark("ingest_ts", watermark)
        .select(
            F.md5("text").alias("h"),
            "doc_id",
            "source",
            "is_new",
            "ingest_ts",
        )
        .groupBy("h")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
