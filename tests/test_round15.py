"""Round-15 tests: verified MinHash dedup (the candidate→VERIFY
discipline), the served t-closeness twin, and the conditional
round-robin guard.

The driver-side oracle hash proves the portable verified pipeline
replays its DuckDB SQL bit-for-bit; these tests pin what the hash
can't see — the verify CONTRACT itself (every non-self dup_of link
has exact shingle-set Jaccard >= the threshold, recomputed in pure
Python from the raw text), the served twin's parity with its
from-scratch form, and the no-op property of ensure_min_splits on
well-split inputs.
"""

from __future__ import annotations

import duckdb
import pytest

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


def _py_shingles(text: str, k: int = 5) -> set[str]:
    toks = text.strip().split()
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i : i + k]) for i in range(n)}


def _py_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _py_shingles(a, k), _py_shingles(b, k)
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# verified MinHash: the verify contract


@pytest.fixture(scope="module", params=["fast", "portable"])
def mv_links(request, spark, sf_dir):
    """(id -> dup_of) of each verified form over the test corpus, plus
    the raw texts for the pure-Python Jaccard recomputation."""
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        minhash_dedup_verified,
        minhash_dedup_verified_portable,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    op = (
        minhash_dedup_verified
        if request.param == "fast"
        else minhash_dedup_verified_portable
    )
    links = {
        r["doc_id"]: r["dup_of"]
        for r in op(docs, "text", "doc_id").collect()
    }
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    return links, texts


def test_verified_links_clear_threshold(mv_links):
    """THE verify contract: every non-self link joins docs whose exact
    5-word-shingle Jaccard >= 0.7, or byte-identical members inheriting
    through their representative. (The unverified banding form fails
    exactly this on noisy corpora — measured pair precision 0.0014 at
    10M docs, PLANTED_TRUTH_r14.)"""
    links, texts = mv_links
    assert len(links) == len(texts)
    checked = 0
    for did, dup in links.items():
        if dup == did:
            continue
        assert dup < did  # links always point at a smaller id
        j = _py_jaccard(texts[did], texts[dup])
        # members inherit their rep's dup_of: the member is
        # byte-identical to its rep, so its OWN jaccard to the target
        # equals the rep's — one bound covers both cases
        assert j >= 0.7, (did, dup, j)
        checked += 1
    assert checked > 0  # the corpus contains real near-dups


def test_verified_is_subset_of_unverified(spark, sf_dir):
    """Verification only REMOVES links: every verified non-self pair is
    also linked (possibly transitively through a bucket min) by the
    unverified fast path's candidate mass — here pinned at the simplest
    level: verified never links MORE pairs than unverified."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_verified,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")

    def mass(df):
        return (
            df.groupBy("dup_of")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("p"))
            .collect()[0]["p"]
        )

    assert mass(
        minhash_dedup_verified(docs, "text", "doc_id")
    ) <= mass(minhash_dedup(docs, "text", "doc_id"))


def test_verified_planted_pair_and_decoy(spark, tmp_path):
    """Planted corpus: a j=0.9 pair must link, a j~0.25 decoy pair and
    unique-noise docs must stay singletons — precision 1.0 by
    construction of the verify stage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{t}" for t in range(40))
    near_a = shared + " xa"
    near_b = shared + " xb"  # ~36/40 shingles shared, j ~ 0.9
    half = " ".join(f"s{t}" for t in range(12))
    decoy_a = half + " " + " ".join(f"da{t}" for t in range(12))
    decoy_b = half + " " + " ".join(f"db{t}" for t in range(12))
    noise = [
        " ".join(f"n{i}t{t}" for t in range(8)) for i in range(50)
    ]
    ids = [0, 1, 2, 3] + list(range(100, 150))
    txt = [near_a, near_b, decoy_a, decoy_b] + noise
    d = tmp_path / "mv_corpus"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(txt, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        minhash_dedup_verified,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    links = {
        r["doc_id"]: r["dup_of"]
        for r in minhash_dedup_verified(
            load_table(spark, str(d), "documents"), "text", "doc_id"
        ).collect()
    }
    assert links[1] == 0  # planted near-dup detected
    assert links[2] == 2 and links[3] == 3  # decoy rejected by verify
    assert all(links[i] == i for i in range(100, 150))


# ---------------------------------------------------------------------------
# served t-closeness twin


def test_t_closeness_served_matches_from_scratch(spark, sf_dir):
    a = REGISTRY["t_closeness_audit"].build(spark, sf_dir).collect()
    b = REGISTRY["t_closeness_audit_served"].build(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------------------
# ensure_min_splits


def test_ensure_min_splits_conditional(spark):
    from healthcare_aihw_etl_pipeline_spark.operators.layout import (
        ensure_min_splits,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    widened = ensure_min_splits(narrow)
    assert widened.rdd.getNumPartitions() == par

    wide = spark.range(1000).repartition(par + 4)
    same = ensure_min_splits(wide)
    # already well-split: MUST be returned untouched (no new exchange)
    assert same is wide


# ---------------------------------------------------------------------------
# streaming as-of twin (batch<->stream parity for the attribution stack)


def _replay_event_batches(spark, tmp_path, batches, transform):
    """Event flavour of the fifo replay harness: land one parquet file
    per micro-batch against a persistent checkpoint, availableNow each
    time, accumulate the parquet sink."""
    import datetime as _dt

    src = str(tmp_path / "ev_src")
    ckpt = str(tmp_path / "ev_ckpt")
    sink = str(tmp_path / "ev_sink")
    schema = "user_id long, ts timestamp, event_type string"
    for rows in batches:
        df = spark.createDataFrame(
            [
                (u, _dt.datetime.fromisoformat(ts), et)
                for (u, ts, et) in rows
            ],
            schema,
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


@pytest.mark.slow  # ~35 s; default siblings:
# test_streaming_asof_late_purchase_still_matches + the watermark
# knife-edge unit tests (same as-of kernel).
def test_streaming_asof_replay_equals_batch(spark, tmp_path, sf_dir):
    """Full-corpus replay equivalence: sf0.001 events split into 3
    ROUND-ROBIN slices (clicks and purchases interleave across batches
    in arbitrary time order) plus a far-future sentinel to drain every
    pending click — the emitted relation must equal the batch
    single-scan self-as-of row-for-row, NULLs included, each click
    emitted exactly once."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.asof import (
        asof_self_join,
    )
    from healthcare_aihw_etl_pipeline_spark.streaming.asof import (
        asof_click_purchase_stream,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        .where(F.col("event_type").isin("click", "purchase"))
    )
    raw = ev.collect()
    slices = [raw[i::3] for i in range(3)]
    horizon = max(r.ts for r in raw) + _dt.timedelta(days=4200)
    batches = [
        [
            (r.user_id, r.ts.isoformat(sep=" "), r.event_type)
            for r in sl
        ]
        for sl in slices
    ]
    batches.append([(999_999_999, horizon.isoformat(sep=" "), "click")])
    rows = _replay_event_batches(
        spark,
        tmp_path,
        batches,
        lambda s: asof_click_purchase_stream(s, watermark="4000 days"),
    )
    got = sorted(
        (r.user_id, r.ts_us, r.asof_us)
        for r in rows
        if r.user_id != 999_999_999
    )
    us = lambda t: None if t is None else int(t.timestamp() * 1_000_000)
    want = sorted(
        (
            r.user_id,
            int(r.ts.timestamp() * 1_000_000),
            us(r.ts_asof),
        )
        for r in asof_self_join(
            ev,
            on=["user_id"],
            ts="ts",
            left_pred=F.col("event_type") == "click",
            right_pred=F.col("event_type") == "purchase",
            value_cols=["ts"],
        ).collect()
    )
    assert got == want


def test_streaming_asof_late_purchase_still_matches(spark, tmp_path):
    """A purchase arriving in a LATER micro-batch with an EARLIER
    timestamp than a buffered click must still become its match — the
    reason clicks wait for the watermark instead of emitting at
    arrival."""
    from healthcare_aihw_etl_pipeline_spark.streaming.asof import (
        asof_click_purchase_stream,
    )

    batches = [
        [(7, "2024-01-10 12:00:00", "click")],
        # late purchase BEFORE the click; same-instant purchase for a
        # second user pins the inclusive <= semantics
        [
            (7, "2024-01-10 11:00:00", "purchase"),
            (8, "2024-01-10 12:00:00", "purchase"),
            (8, "2024-01-10 12:00:00", "click"),
        ],
        [(1, "2026-01-01 00:00:00", "click")],  # sentinel: drain
    ]
    rows = _replay_event_batches(
        spark,
        tmp_path,
        batches,
        lambda s: asof_click_purchase_stream(s, watermark="10 days"),
    )
    import datetime as _dt

    def us(s):
        return int(
            _dt.datetime.fromisoformat(s).timestamp() * 1_000_000
        )

    got = {(r.user_id, r.ts_us): r.asof_us for r in rows if r.user_id != 1}
    assert got == {
        (7, us("2024-01-10 12:00:00")): us("2024-01-10 11:00:00"),
        (8, us("2024-01-10 12:00:00")): us("2024-01-10 12:00:00"),
    }


# ---------------------------------------------------------------------------
# collapse-first embedding_cluster_keep_best: equivalence on a
# replicated corpus (the path sf0.01's all-unique layout cannot reach)


def test_embedding_keep_best_collapse_equals_uncollapsed(spark, sf_dir):
    """The collapse-first form must produce the IDENTICAL cluster-size
    histogram as the uncollapsed composition on a corpus where every
    vector is replicated — exact groups are fully connected
    (cos(v,v)=1), so rep-level components + member re-attachment is an
    algebraic identity, and the keep-best key q*2^32+node peaks at
    each group's max id."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        _as_double_array,
        embedding_near_dup_pairs,
        l2_norm,
    )
    from healthcare_aihw_etl_pipeline_spark.plans.round8b_queries import (
        _SEMDEDUP_COS,
        embedding_cluster_keep_best,
    )

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # 3-way replication with distinct ids — the bench-layout shape
    rep = base
    for shift in (1_000_000, 2_000_000):
        rep = rep.unionByName(
            base.select(
                (F.col("vec_id") + F.lit(shift)).alias("vec_id"),
                "embedding",
            )
        )
    src = f"{sf_dir}/embeddings.parquet"
    tmp = spark.createDataFrame(rep.collect(), rep.schema)
    tmp_dir = f"/tmp/keepbest_eq_{abs(hash(src)) % 10**8}"
    tmp.write.mode("overwrite").parquet(f"{tmp_dir}/embeddings.parquet")

    got = {
        tuple(r)
        for r in embedding_cluster_keep_best(spark, tmp_dir).collect()
    }

    # the uncollapsed original, inline
    emb = spark.read.parquet(f"{tmp_dir}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(
        emb, "embedding", "vec_id", n_bands=8, band_bits=8
    ).where(F.col("cos") >= F.lit(_SEMDEDUP_COS))
    cc = connected_components(pairs, src="id_a", dst="id_b")
    q = emb.select(
        F.col("vec_id").alias("node"),
        F.floor(
            l2_norm(_as_double_array("embedding")) * F.lit(1_000_000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("q"),
    )
    clusters = (
        cc.join(q, "node")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.max_by(
                "node", F.col("q") * F.lit(4294967296) + F.col("node")
            ).alias("keeper"),
        )
    )
    want = {
        tuple(r)
        for r in clusters.groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.sum("size") - F.count(F.lit(1))).alias("n_removed"),
            F.min("keeper").alias("min_keeper"),
        )
        .collect()
    }
    assert got == want
    # every replicated vector forms a cluster: total members accounted
    assert sum(s * n for s, n, _, _ in got) == rep.count()
