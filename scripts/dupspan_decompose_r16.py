"""Round-16 dup_span_stats decomposition (VERDICT r15 Next #3).

The r15 quiet-host re-pair rated dup_span_stats 2.0x at sf10 (12.0 vs
6.0 s). Before attacking, decompose the 12 s into its three stages —
gram hash scan, span-merge window, top-k — and A/B the current
two-pass formulation (hash the corpus twice: once for the dup-gram
groupBy, once for the position join-back) against a ONE-pass variant
that detects duplicated grams with a window aggregate
(min(doc_id) != max(doc_id) over the h partition) so the corpus is
hashed and shuffled on h exactly once.

Usage: python scripts/dupspan_decompose_r16.py [SF_DIR ...]
Writes one JSON line per experiment to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.operators.layout import (
    ensure_min_splits,
)
from healthcare_aihw_etl_pipeline_spark.plans.round14b_queries import (
    _DS_K,
    _DS_TOP,
    dup_span_stats,
)
from healthcare_aihw_etl_pipeline_spark.operators.search import tokens

DIRS = sys.argv[1:] or ["/tmp/sfbench/sf1", "/tmp/sfbench/sf10"]


def _gram_hashes(t):
    def _h(i):
        gram = F.concat_ws(
            " ",
            *[F.element_at(t, i + F.lit(j + 1)) for j in range(_DS_K)],
        )
        return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")

    return F.transform(F.sequence(F.lit(0), F.size(t) - F.lit(_DS_K)), _h)


def _pos(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (
        ensure_min_splits(docs)
        .where(F.trim(F.col("text")) != "")
        .select("doc_id", tokens("text").alias("t"))
        .where(F.size("t") >= _DS_K)
    )
    return toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.posexplode(_gram_hashes(F.col("t"))).alias("p", "h"),
    )


def one_pass_variant(spark, sf_dir):
    """ONE hash pass: duplicated-gram detection as a window aggregate
    over the h partition (>=2 distinct docs <=> min != max doc_id),
    then the island window. Corpus hashed once, shuffled on h once,
    on doc_id once."""
    pos = _pos(spark, sf_dir)
    wh = Window.partitionBy("h")
    dpos = (
        pos.withColumn("_dmin", F.min("doc_id").over(wh))
        .withColumn("_dmax", F.max("doc_id").over(wh))
        .where(F.col("_dmin") != F.col("_dmax"))
        .select("doc_id", "n_tokens", "p")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = dpos.withColumn(
        "b",
        F.when(
            F.lag("p").over(w).isNull()
            | (F.col("p") - F.lag("p").over(w) > _DS_K),
            1,
        ).otherwise(0),
    )
    isl = brk.withColumn(
        "island",
        F.sum("b").over(
            Window.partitionBy("doc_id")
            .orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = isl.groupBy("doc_id", "n_tokens", "island").agg(
        (F.max("p") - F.min("p") + F.lit(_DS_K)).alias("span_tokens")
    )
    perdoc = spans.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
        F.max("span_tokens").cast("long").alias("max_span"),
    )
    return (
        perdoc.select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "dup_tokens",
            "max_span",
            F.expr("dup_tokens * 1000000 div n_tokens").alias("dup_ppm"),
        )
        .orderBy(F.col("dup_ppm").desc(), F.col("doc_id").asc())
        .limit(_DS_TOP)
    )


def persist_minmax_variant(spark, sf_dir):
    """ONE hash pass via a lazy persist of the slim position stream
    (32 B/row), with dup-gram detection as the map-side-combinable
    min(doc_id) != max(doc_id) aggregate (no countDistinct expansion)
    and the join-back keeping the AQE-skew-handled shape."""
    from pyspark.storagelevel import StorageLevel

    pos = _pos(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        pos.groupBy("h")
        .agg(F.min("doc_id").alias("_a"), F.max("doc_id").alias("_b"))
        .where(F.col("_a") != F.col("_b"))
        .select("h")
    )
    dpos = pos.join(dup, "h").select("doc_id", "n_tokens", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = dpos.withColumn(
        "b",
        F.when(
            F.lag("p").over(w).isNull()
            | (F.col("p") - F.lag("p").over(w) > _DS_K),
            1,
        ).otherwise(0),
    )
    isl = brk.withColumn(
        "island",
        F.sum("b").over(
            Window.partitionBy("doc_id")
            .orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = isl.groupBy("doc_id", "n_tokens", "island").agg(
        (F.max("p") - F.min("p") + F.lit(_DS_K)).alias("span_tokens")
    )
    perdoc = spans.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
        F.max("span_tokens").cast("long").alias("max_span"),
    )
    out = (
        perdoc.select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "dup_tokens",
            "max_span",
            F.expr("dup_tokens * 1000000 div n_tokens").alias("dup_ppm"),
        )
        .orderBy(F.col("dup_ppm").desc(), F.col("doc_id").asc())
        .limit(_DS_TOP)
    )
    rows = [tuple(r) for r in out.collect()]
    pos.unpersist()
    return rows


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for d in DIRS:
        sf = os.path.basename(d)
        # stage 1 alone: hash scan + positions (count() forces the scan
        # but no shuffle consumption beyond the local agg)
        t0 = time.time()
        n_pos = _pos(spark, d).count()
        t_scan = time.time() - t0
        # stage 1+2a: dup-gram groupBy (the first h shuffle)
        t0 = time.time()
        pos = _pos(spark, d)
        n_dup = (
            pos.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") >= 2)
            .count()
        )
        t_dup = time.time() - t0
        # full current formulation
        t0 = time.time()
        cur = [tuple(r) for r in dup_span_stats(spark, d).collect()]
        t_cur = time.time() - t0
        # one-pass window variant
        t0 = time.time()
        alt = [tuple(r) for r in one_pass_variant(spark, d).collect()]
        t_alt = time.time() - t0
        # one-pass persist + min/max variant
        t0 = time.time()
        alt2 = persist_minmax_variant(spark, d)
        t_alt2 = time.time() - t0
        # same-run DuckDB oracle pair
        import duckdb

        from healthcare_aihw_etl_pipeline_spark.plans.registry import (
            REGISTRY,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        t0 = time.time()
        con.execute(REGISTRY["dup_span_stats"].oracle).fetchall()
        t_duck = time.time() - t0
        con.close()
        out[sf] = {
            "n_pos": n_pos,
            "n_dup_grams": n_dup,
            "scan_s": round(t_scan, 2),
            "scan_plus_dupgroup_s": round(t_dup, 2),
            "current_s": round(t_cur, 2),
            "one_pass_window_s": round(t_alt, 2),
            "persist_minmax_s": round(t_alt2, 2),
            "duckdb_s": round(t_duck, 2),
            "equal": cur == alt,
            "equal2": cur == alt2,
        }
        print(json.dumps({sf: out[sf]}), flush=True)
    print(json.dumps({"dupspan_decompose_r16": out}), flush=True)


if __name__ == "__main__":
    main()
