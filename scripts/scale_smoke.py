#!/usr/bin/env python
"""Medium-scale smoke: synthesize a multi-file dataset (~5M fact rows,
20k documents) in a scratch dir, then time the engine's hot paths with
real scan parallelism (the shipped sf0.1 testdata is single-row-group —
1 scan task — so this is where multi-task behavior is actually observed).

Usage: python scripts/scale_smoke.py [rows] [docs] [scratch_dir]
Prints one JSON line with timings.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark import get_spark
from healthcare_aihw_etl_pipeline_spark.operators.dedup import minhash_dedup
from healthcare_aihw_etl_pipeline_spark.operators.similarity import lsh_topk
from healthcare_aihw_etl_pipeline_spark.plans.registry import cents, dollars


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    scratch = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(prefix="scale_smoke_")

    spark = get_spark(
        app_name="scale_smoke",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.locality.wait": "0"},
    )
    out: dict[str, float] = {}

    # --- synthesize fact table: 32 files, deterministic columns
    fact_path = f"{scratch}/fact"
    t0 = time.perf_counter()
    (
        spark.range(0, rows, 1, 32)
        .select(
            (F.col("id") % 1_500_000).alias("orderkey"),
            (F.col("id") % 25).cast("int").alias("nationkey"),
            (F.pmod(F.xxhash64("id"), 10_000_000).cast("double") / 100.0 + 900.0).alias("price"),
            ((F.pmod(F.xxhash64("id", F.lit(1)), 11)).cast("double") / 100.0).alias("discount"),
            F.concat(F.lit("flag_"), (F.col("id") % 3).cast("string")).alias("flag"),
        )
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    out["gen_fact_sec"] = round(time.perf_counter() - t0, 2)

    fact = spark.read.parquet(fact_path)
    rev = cents("price") * (F.lit(100) - cents("discount"))

    def timed(name, fn, n=2):
        best = 9e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)

    timed(
        "agg_by_flag_sec",
        lambda: fact.groupBy("flag").agg(F.sum(rev).alias("r"))
        .select("flag", dollars(F.col("r"), "revenue", 4)).collect(),
    )
    timed(
        "agg_by_orderkey_sec",  # high-cardinality shuffle (1.5M groups)
        lambda: fact.groupBy("orderkey").agg(F.sum(rev).alias("r")).count(),
    )

    # --- synthesize documents: deterministic word salad with planted dups
    words = [f"w{i}" for i in range(500)]
    words_arr = F.array(*[F.lit(w) for w in words])
    docs_path = f"{scratch}/docs"
    t0 = time.perf_counter()
    base = (
        spark.range(0, n_docs, 1, 16)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(120)),
                    # ~1% of docs share a text (id div 100 collision for id%100<1)
                    lambda i: F.element_at(
                        words_arr,
                        (F.pmod(F.xxhash64((F.col("id") - F.col("id") % 100) if False else F.col("id") % F.lit(19_777), i), 500) + 1).cast("int"),
                    ),
                ),
            ).alias("text"),
        )
    )
    base.write.mode("overwrite").parquet(docs_path)
    out["gen_docs_sec"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(docs_path)

    timed("minhash_dedup_sec", lambda: minhash_dedup(docs, "text", "doc_id").where("dup_of <> doc_id").count(), n=1)

    # --- round-3 text ops at corpus scale (same expressions as the
    # registered queries, inlined over the synthetic corpus)
    sdocs = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 50).cast("string"))
    )

    def entropy():
        # two map-side-combined shuffles: (source, tok) then source
        counts = (
            sdocs.select("source", F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("source", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
        p = F.col("c").cast("double") / F.col("n")
        return (
            counts.join(tot, "source")
            .groupBy("source")
            .agg((-F.sum(p * F.log2(p))).alias("h"))
            .collect()
        )

    timed("token_entropy_sec", entropy, n=1)

    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

    def pii_scrub():
        injected = F.concat(
            F.col("text"), F.lit(" user"), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        )
        t = sdocs.select(
            "source",
            injected.alias("text"),
        ).select(
            "source",
            (F.length("text") - F.length(F.regexp_replace("text", email_re, "[EMAIL]"))).alias("d"),
            F.regexp_count("text", F.lit(email_re)).alias("n"),
        )
        return t.groupBy("source").agg(F.sum("d"), F.sum("n")).collect()

    timed("pii_scrub_sec", pii_scrub, n=1)

    def curation_funnel():
        # quality flags + md5 window dedup + deterministic sample, ONE action
        from pyspark.sql import Window

        from healthcare_aihw_etl_pipeline_spark.operators.text import hash_sample

        toks = F.split("text", " ")
        ok = F.size(F.array_distinct(toks)).cast("double") / F.size(toks) > 0.3
        base = sdocs.select(
            "doc_id", F.md5("text").alias("h"), F.size(toks).alias("n_toks"),
            ok.alias("ok"),
        )
        w = Window.partitionBy("h").orderBy(F.col("ok").desc(), F.col("doc_id").asc())
        marked = base.withColumn("rn", F.row_number().over(w)).select(
            "n_toks", "ok",
            (F.col("ok") & (F.col("rn") == 1)).alias("keeper"),
            (F.col("ok") & (F.col("rn") == 1) & hash_sample("doc_id", 0.5)).alias("sampled"),
        )
        return marked.agg(
            F.count(F.lit(1)), F.sum(F.col("ok").cast("long")),
            F.sum(F.col("keeper").cast("long")), F.sum(F.col("sampled").cast("long")),
        ).collect()

    timed("curation_funnel_sec", curation_funnel, n=1)

    def chunk_dedup():
        # chunk-level keep-first + reassembly (registered query shape):
        # aggregate argmin on the chunk hash (map-side partials — the
        # ~1%-duplicated texts produce hot chunk hashes that a window
        # would pin to one task), join back, re-sort per doc.
        from healthcare_aihw_etl_pipeline_spark.operators.text import chunk_tokens

        chunks = (
            sdocs.select(
                "doc_id",
                F.posexplode(chunk_tokens("text", size=40, stride=40)).alias(
                    "chunk_idx", "chunk"
                ),
            )
            .select(
                "doc_id",
                "chunk_idx",
                F.concat_ws(" ", F.col("chunk")).alias("chunk_text"),
            )
            .withColumn("h", F.md5("chunk_text"))
        )
        winners = chunks.groupBy("h").agg(
            F.min(F.struct("doc_id", "chunk_idx")).alias("w")
        )
        kept = (
            chunks.join(winners, "h")
            .where(
                (F.col("doc_id") == F.col("w.doc_id"))
                & (F.col("chunk_idx") == F.col("w.chunk_idx"))
            )
            .groupBy("doc_id")
            .agg(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("chunk_idx", "chunk_text"))
                            ),
                            lambda s: s.getField("chunk_text"),
                        ),
                    )
                ).alias("new_hash")
            )
        )
        return kept.count()

    timed("chunk_dedup_sec", chunk_dedup, n=1)

    # --- embeddings: 64-dim deterministic vectors
    emb = spark.range(0, 50_000, 1, 16).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.pmod(F.xxhash64("id", i), 2000).cast("double") - 1000.0) / 1000.0,
        ).alias("embedding"),
    )
    q = [((hash((0, i)) % 2000) - 1000) / 1000.0 for i in range(64)]
    timed("lsh_topk_sec", lambda: lsh_topk(emb, "embedding", "vec_id", q, 10).collect(), n=1)

    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb_path = f"{scratch}/emb"
    emb.write.mode("overwrite").parquet(emb_path)
    emb_on_disk = spark.read.parquet(emb_path)
    # 4 bands × 16 bits is the scale config: on uniform vectors the 8×8
    # test-recall config yields ~38.5M candidate pairs (12+ s); widening
    # to 16-bit buckets cuts that to ~76k pairs (4.8 s measured) — the
    # candidate count, not the vector math, is the cost driver.
    timed(
        "embedding_near_dup_sec",  # 50k vectors, sign-band LSH + exact verify
        lambda: embedding_near_dup_pairs(
            emb_on_disk, "embedding", "vec_id", n_bands=4, band_bits=16
        ).count(),
        n=1,
    )

    def centroid():
        # per-label dimension-wise centroid: 50k × 64 explode → (label,
        # dim) aggregate with map-side combine; quantized integer sums.
        labeled = emb_on_disk.withColumn(
            "label", (F.col("vec_id") % 16).cast("int")
        )
        comps = labeled.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        ).select(
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("long").alias("q"),
        )
        return (
            comps.groupBy("label", "dim")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("qs"))
            .count()
        )

    timed("embedding_centroid_sec", centroid, n=1)

    # --- events: interval join + funnel at fact scale
    ev_path = f"{scratch}/events"
    t0 = time.perf_counter()
    (
        spark.range(0, rows // 5, 1, 32)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 200_000).alias("user_id"),
            F.expr(
                "timestampadd(SECOND, CAST(pmod(xxhash64(id), 2592000) AS INT), "
                "TIMESTAMP_NTZ '2024-01-01 00:00:00')"
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]),
                (F.pmod(F.xxhash64("id", F.lit(7)), 5) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(9)), 20000).cast("double") / 100.0).alias("value"),
        )
        .write.mode("overwrite")
        .parquet(ev_path)
    )
    out["gen_events_sec"] = round(time.perf_counter() - t0, 2)
    ev = spark.read.parquet(ev_path)

    def interval_join_count():
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            cents(F.col("value")).alias("v"),
        )
        cond = (
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") >= F.expr("ts - INTERVAL 30 MINUTES"))
            & (F.col("click_ts") < F.col("ts"))
        )
        return (
            purchases.join(clicks, cond, "left")
            .groupBy("event_id")
            .agg(F.count("click_ts").alias("n"))
            .count()
        )

    timed("interval_join_sec", interval_join_count, n=1)  # 1M ⋈ 1M on 200k users

    def funnel_counts():
        # Single-action union (the registered query's shape): 1.9 s vs
        # 5.4 s for three separate count() actions on the same stages —
        # one job amortizes the shared lineage even without exchange
        # reuse.
        s = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
            F.min("ts").alias("t1")
        )
        v = (
            ev.where(F.col("event_type") == "view")
            .join(s, "user_id")
            .where(F.col("ts") > F.col("t1"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
        )
        p = (
            ev.where(F.col("event_type") == "purchase")
            .join(v, "user_id")
            .where(F.col("ts") > F.col("t2"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t3"))
        )

        def stage(n, df):
            return df.agg(
                F.lit(n).cast("int").alias("stage"), F.count(F.lit(1)).alias("n")
            )

        return stage(1, s).unionAll(stage(2, v)).unionAll(stage(3, p)).collect()

    timed("funnel_sec", funnel_counts, n=1)

    # --- round-4 ops at corpus scale ---------------------------------

    def char_diversity():
        # explode-per-char, aggregated map-side per (doc, char) — the
        # registered char_diversity_profile shape
        per_char = (
            sdocs.select(
                "doc_id", "source", F.explode(F.split("text", "")).alias("c")
            )
            .where(F.col("c") != "")
            .groupBy("doc_id", "source", "c")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        per_doc = per_char.groupBy("doc_id", "source").agg(
            F.count(F.lit(1)).alias("ndc"),
            F.expr("(MAX(n) * 1000000L) DIV SUM(n)").alias("share"),
        )
        return per_doc.groupBy("source").agg(
            F.count(F.lit(1)), F.sum("ndc"), F.sum("share")
        ).collect()

    timed("char_diversity_sec", char_diversity, n=1)

    def lev_blocked():
        # blocked edit-distance verify. THE scale rule for this op:
        # block COUNT must grow with the corpus so docs-per-block stays
        # constant — pair fan-out is n_docs * docs_per_block / 2, linear
        # in docs. (First run of this smoke held 512 blocks fixed at
        # 200k docs → 39M pairs → 210 s; ~40 docs/block → 4M pairs.)
        n_blocks = max(n_docs // 40, 1)
        blocked = sdocs.select(
            "doc_id",
            (F.col("doc_id") % n_blocks).alias("blk"),
            F.substring("text", 1, 60).alias("head"),
        )
        a, b = blocked.alias("a"), blocked.alias("b")
        dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
        return (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.when(dist <= 20, 1).otherwise(0)).alias("n_near"),
            )
            .collect()
        )

    timed("levenshtein_blocked_sec", lev_blocked, n=1)

    def ewma_series():
        # bucketed self range join over a synthetic daily series as long
        # as the fact table has days (rows/86400-ish: use event days)
        daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
            F.sum(cents("value")).alias("rev_c")
        )
        build = daily.select(
            F.date_trunc("month", "d").alias("m"),
            F.col("d").alias("bd"),
            F.col("rev_c").alias("brev"),
        )
        probe = daily.select(
            "d",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.date_trunc("month", "d"),
                        F.date_trunc("month", F.date_sub("d", 13)),
                    )
                )
            ).alias("m"),
        )
        lag = F.datediff("d", "bd")
        w = [round(0.9**k * 1_000_000) for k in range(14)]
        wt = F.element_at(F.expr(f"array({', '.join(f'{x}L' for x in w)})"), lag + 1)
        return (
            probe.join(build, "m")
            .where((lag >= 0) & (lag <= 13))
            .groupBy("d")
            .agg(F.sum(F.col("brev") * wt).alias("num"), F.sum(wt).alias("den"))
            .count()
        )

    timed("ewma_series_sec", ewma_series, n=1)

    # --- round-5 ops at corpus scale
    from healthcare_aihw_etl_pipeline_spark.plans.round5_queries import (
        _word_ngrams,
    )

    def ngram_census():
        # duplicate_ngram_top20 shape: explode 8-grams (113 per 120-token
        # doc), one shuffle with map-side partial count/count-distinct.
        return (
            docs.select("doc_id", F.explode(_word_ngrams("text", 8)).alias("g"))
            .groupBy("g")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occ"),
            )
            .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("g"))
            .limit(20)
            .collect()
        )

    timed("ngram_census_sec", ngram_census, n=1)

    def jaccard_pairs():
        # jaccard_pair_similarity shape WITH the document-frequency cap
        # the query's docstring prescribes at scale: drop grams with
        # df > 50 before the self-join (stopword-like grams dominate
        # pair fan-out: Σ df² over grams). The cap turns a potentially
        # quadratic join into one bounded by 50·|rare grams|.
        grams = (
            docs.select("doc_id", F.explode(_word_ngrams("text", 5)).alias("g"))
            .distinct()
        )
        rare = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= 50
        )
        pruned = grams.join(rare.select("g"), "g")
        a, b = pruned.alias("a"), pruned.alias("b")
        return (
            a.join(
                b,
                (F.col("a.g") == F.col("b.g"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
            .agg(F.count(F.lit(1)).alias("inter"))
            .where(F.col("inter") >= 20)
            .count()
        )

    timed("jaccard_pairs_sec", jaccard_pairs, n=1)

    out["rows"] = rows
    out["n_docs"] = n_docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
