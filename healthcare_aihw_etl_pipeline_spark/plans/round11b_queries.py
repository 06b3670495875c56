"""Round-11 continuation: four further engine families —

- hybrid retrieval fusion (reciprocal-rank fusion of the BM25 lexical
  ranking with the dense cosine ranking, the standard hybrid-search
  combiner for RAG/retrieval pipelines),
- grid-density clustering (DBSCAN-style: dense grid cells merged
  through 8-neighbour adjacency into clusters — the scalable
  density-clustering shape, complementing the centroid-based k-means
  family),
- winnowing document fingerprints (the MOSS local fingerprinting
  algorithm: k-gram rolling hashes, per-window minima — the
  document-fingerprinting leg of the dedup family, fully row-local
  until one fingerprint-grain aggregate),
- Theil-Sen robust trend (median of pairwise slopes over the
  calendar-bounded day grain, next to the exact-moment OLS the
  registry already carries).

Same contract as every plans module: idiomatic PySpark paired with a
DuckDB oracle whose arithmetic is bit-identical — exact integer cents,
integer-quantized scores/slopes before any ranking or median, single
IEEE divides on identical literal expressions, and truncating integer
division (Spark ``div`` and DuckDB ``//`` both truncate toward zero —
verified on negative operands). Reference lineage: the reference
(/root/reference/main.py, /root/reference/streamlit_app.py:108-152)
serves grouped/ranked views of admissions data; these queries extend
the ranked-analytics surface to retrieval fusion, density clustering,
fingerprinting, and robust regression at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.operators.search import (
    sql_contrib,
    sql_tokens,
)
from healthcare_aihw_etl_pipeline_spark.plans.registry import (
    cents,
    register,
    sql_cents,
)
from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (BM25 x dense cosine)

# RRF constant (Cormack/Clarke/Buettcher 2009: k=60 is the published
# default) and fusion depth. Contributions are exact integers:
# 10^9 div (60 + rank) — both engines truncate toward zero, so the
# fused score is hash-stable with no float in the ranking path.
_RRF_K = 60
_RRF_DEPTH = 50
_RRF_NUM = 1_000_000_000

_RRF_TERMS = ["dup", "spark", "merge"]


@register(
    "hybrid_rrf_fusion_top10",
    oracle=f"""
    WITH stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl
      FROM (SELECT len({sql_tokens('text')}) AS dl
            FROM documents WHERE trim(text) <> '')
    ),
    matches AS (
      SELECT doc_id, tok AS token, COUNT(*) AS tf, MAX(dl) AS dl
      FROM (
        SELECT doc_id, len(toks) AS dl, UNNEST(toks) AS tok
        FROM (SELECT doc_id, {sql_tokens('text')} AS toks
              FROM documents WHERE trim(text) <> '')
      )
      WHERE tok IN ('dup', 'spark', 'merge')
      GROUP BY doc_id, tok
    ),
    dfm AS (
      SELECT *, COUNT(*) OVER (PARTITION BY token) AS doc_freq FROM matches
    ),
    contrib AS (
      SELECT m.doc_id, {sql_contrib('s.n_docs', 's.sum_dl')} AS contrib_q
      FROM dfm m, stats s
    ),
    bm25 AS (
      SELECT doc_id, CAST(SUM(contrib_q) AS BIGINT) AS score_q
      FROM contrib GROUP BY doc_id
      ORDER BY score_q DESC, doc_id LIMIT {_RRF_DEPTH}
    ),
    bm25r AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id)
                  AS BIGINT) AS r_bm25
      FROM bm25
    ),
    q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0
    ),
    dense AS (
      SELECT e.vec_id,
             ROUND(list_sum(list_transform(
                     list_zip(list_transform(e.embedding,
                                             x -> CAST(x AS DOUBLE)), q.qv),
                     p -> p[1] * p[2]))
             / (sqrt(list_sum(list_transform(e.embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6) AS cos
      FROM embeddings e, q
      ORDER BY cos DESC, vec_id LIMIT {_RRF_DEPTH}
    ),
    denser AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id)
                  AS BIGINT) AS r_dense
      FROM dense
    )
    SELECT COALESCE(b.doc_id, d.vec_id) AS doc_id,
           b.r_bm25 AS r_bm25,
           d.r_dense AS r_dense,
           CAST(COALESCE({_RRF_NUM} // ({_RRF_K} + b.r_bm25), 0)
                + COALESCE({_RRF_NUM} // ({_RRF_K} + d.r_dense), 0)
                AS BIGINT) AS rrf_q
    FROM bm25r b FULL JOIN denser d ON b.doc_id = d.vec_id
    ORDER BY rrf_q DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical "
    "top-50 (query bag {dup, spark, merge}) and the dense cosine top-50 "
    "(probe = embedding of vec_id 0, one vector per document in the "
    "synthetic corpus) fused by RRF with the published k=60 — "
    "contribution 10^9 div (60 + rank), an exact integer in both "
    "engines (div and // both truncate toward zero), so the fused "
    "ranking is hash-stable end to end. Documents outside one leg's "
    "coverage (at sf0.1 only 2000 of 5000 docs carry embeddings — "
    "partial dense coverage, the realistic hybrid-search case) score "
    "on the surviving leg alone via the FULL OUTER fusion join. Scale "
    "shape: each leg is an independent bounded top-k "
    "(TakeOrderedAndProject — per-partition heaps, no global sort; the "
    "BM25 leg reuses bm25_topk's zero-corpus-explode two-scan plan), "
    "and everything after the two top-50s — ranking windows, the "
    "fusion join, the final top-10 — runs on <=100 rows of metadata. "
    "Fusing deeper rankings at 100 TB changes only the constant "
    "_RRF_DEPTH; the legs stay heap-bounded.",
)
def hybrid_rrf_fusion_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.relational import top_k
    from healthcare_aihw_etl_pipeline_spark.operators.search import bm25_topk
    from healthcare_aihw_etl_pipeline_spark.operators.similarity import (
        cosine_to_query,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # Lexical leg: exact integer-quantized BM25, depth-50.
    bm25 = bm25_topk(docs, "text", "doc_id", _RRF_TERMS, k=_RRF_DEPTH).select(
        "doc_id", "score_q"
    )
    # The rank windows run AFTER each leg's LIMIT — 50-row relations, so
    # the unpartitioned window is bounded by construction, not by data.
    wb = Window.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    bm25r = bm25.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("r_bm25")
    )

    # Dense leg: 6dp-quantized cosine (the ann_cosine_top10 contract),
    # depth-50.
    qv = [
        float(x)
        for x in emb.where("vec_id = 0").select("embedding").first()[0]
    ]
    scored = emb.select(
        "vec_id",
        F.round(cosine_to_query("embedding", qv), 6).alias("cos"),
    )
    dense = top_k(scored, "cos", _RRF_DEPTH, tiebreak=["vec_id"])
    wd = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    denser = dense.select(
        "vec_id", F.row_number().over(wd).cast("long").alias("r_dense")
    )

    fused = bm25r.join(
        denser, bm25r["doc_id"] == denser["vec_id"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
        "r_bm25",
        "r_dense",
        (
            F.coalesce(
                F.expr(f"{_RRF_NUM} div ({_RRF_K} + r_bm25)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{_RRF_NUM} div ({_RRF_K} + r_dense)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_q"),
    )
    return fused.orderBy(
        F.col("rrf_q").desc(), F.col("doc_id").asc()
    ).limit(10)


# ---------------------------------------------------------------------------
# Grid-density clustering (DBSCAN-style over the embedding plane)

# Cell width in embedding units and the dense-cell point threshold.
# Quantization is floor(x / eps) on the DOUBLE value — one IEEE divide
# by a literal then an exact floor, identical in both engines.
_GRID_EPS = 0.08
_GRID_MINPTS = 8
# Cell-id encoding: (cx + B) * 2B + (cy + B). Embedding coordinates are
# O(1) (unit-scale vectors), so |cx| << B at any SF; 2^21 * 2^22 < 2^63.
_GRID_B = 1 << 20
_GRID_ENC = 1 << 21

_GRID_NEIGHBORS = [
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
]


@register(
    "grid_density_clusters",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / {_GRID_EPS}) AS BIGINT)
               AS cx,
             CAST(floor(CAST(embedding[2] AS DOUBLE) / {_GRID_EPS}) AS BIGINT)
               AS cy
      FROM embeddings
    ),
    dense AS (
      SELECT cx, cy,
             (cx + {_GRID_B}) * {_GRID_ENC} + (cy + {_GRID_B}) AS cid,
             COUNT(*) AS n
      FROM pts GROUP BY cx, cy HAVING COUNT(*) >= {_GRID_MINPTS}
    ),
    edges AS (
      SELECT a.cid AS s, b.cid AS d
      FROM dense a JOIN dense b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    ),
    r(cell, lab) AS (
      SELECT cid, cid FROM dense
      UNION
      SELECT e.s, r.lab FROM edges e JOIN r ON r.cell = e.d
    ),
    labels AS (SELECT cell, MIN(lab) AS component FROM r GROUP BY cell)
    SELECT CAST(l.component AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(dn.n) AS BIGINT) AS n_points
    FROM labels l JOIN dense dn ON dn.cid = l.cell
    GROUP BY l.component
    ORDER BY n_points DESC, cluster_id
    """,
    doc="Grid-density clustering, the scalable DBSCAN shape: points "
    "quantize to grid cells (floor(coord/eps) on the first two "
    "embedding dimensions — exact integer cells, no float in any key), "
    "cells holding >= minpts points are dense, and dense cells merge "
    "through 8-neighbour adjacency into clusters via the engine's "
    "connected-components operator (min reachable cell id = the "
    "deterministic cluster label). Complements kmeans_refine_clusters: "
    "density clustering finds arbitrary-shape clusters and needs no k. "
    "Scale shape: ONE fact-grain shuffle (the cell groupBy, map-side "
    "combined); everything after runs on the CELL grain, which is "
    "bounded by the coordinate range / eps^2 — a geometry constant, "
    "not a data quantity — so the neighbour join broadcasts and the "
    "closure is metadata-sized at any corpus size. The oracle replays "
    "the closure as a recursive CTE over the same bounded cell graph.",
)
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    e0 = F.col("embedding").getItem(0).cast("double")
    e1 = F.col("embedding").getItem(1).cast("double")
    pts = emb.select(
        F.floor(e0 / F.lit(_GRID_EPS)).alias("cx"),
        F.floor(e1 / F.lit(_GRID_EPS)).alias("cy"),
    )
    dense = (
        pts.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _GRID_MINPTS)
        .withColumn(
            "cid",
            (F.col("cx") + F.lit(_GRID_B)) * F.lit(_GRID_ENC)
            + (F.col("cy") + F.lit(_GRID_B)),
        )
        # Cell grain is geometry-bounded; materialize once for the three
        # consumers (neighbour probe, neighbour build, point rollup)
        # instead of re-running the fact-grain groupBy per consumer.
        .localCheckpoint(eager=True)
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).cast("long").alias("dx"),
                F.lit(dy).cast("long").alias("dy"),
            )
            for dx, dy in _GRID_NEIGHBORS
        ]
    )
    cand = dense.select(
        "cid",
        F.explode(offs).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "cid",
        (
            (F.col("cx") + F.col("o.dx") + F.lit(_GRID_B))
            * F.lit(_GRID_ENC)
            + (F.col("cy") + F.col("o.dy") + F.lit(_GRID_B))
        ).alias("ncid"),
    )
    edges = cand.join(
        F.broadcast(dense.select(F.col("cid").alias("ncid"))), "ncid"
    ).select("cid", "ncid")
    labels = connected_components(edges, src="cid", dst="ncid")
    comp = (
        dense.join(
            F.broadcast(labels), dense["cid"] == labels["node"], "left"
        )
        # Isolated dense cells have no non-self edge (the closure drops
        # self-loops); they are their own singleton cluster.
        .select(
            F.coalesce(F.col("component"), F.col("cid")).alias("cluster_id"),
            "n",
        )
    )
    return (
        comp.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").alias("n_points"),
        )
        .orderBy(F.col("n_points").desc(), F.col("cluster_id").asc())
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (MOSS local fingerprinting)

# k-gram size (tokens) and winnowing window (k-grams). Guarantee: any
# shared token run of length >= _WIN_K + _WIN_W - 1 produces at least
# one shared fingerprint (Schleimer/Wilkerson/Aiken 2003).
_WIN_K = 3
_WIN_W = 4


@register(
    "winnow_shared_fingerprints",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE trim(text) <> ''
    ),
    kh AS (
      SELECT doc_id,
             list_transform(
               range(0, len(t) - {_WIN_K - 1}),
               i -> CAST('0x' || substr(md5(t[i+1] || ' ' || t[i+2]
                                            || ' ' || t[i+3]), 1, 8)
                    AS BIGINT)) AS h
      FROM docs WHERE len(t) >= {_WIN_K + _WIN_W - 1}
    ),
    fp AS (
      SELECT doc_id,
             UNNEST(list_transform(
               range(0, len(h) - {_WIN_W - 1}),
               s -> list_min(list_slice(h, s + 1, s + {_WIN_W})))) AS f
      FROM kh
    ),
    perdoc AS (
      SELECT doc_id, f, COUNT(*) AS c FROM fp GROUP BY doc_id, f
    )
    SELECT f AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM perdoc GROUP BY f
    ORDER BY n_docs DESC, n_occurrences DESC, fingerprint LIMIT 20
    """,
    doc="Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): "
    "token 3-grams hash through portable md5 (first 8 hex chars as an "
    "integer — bit-replayable in any engine), every sliding window of "
    "4 k-gram hashes selects its minimum, and the selected hashes are "
    "the document's fingerprints — the locality guarantee (any shared "
    "run of >= 6 tokens shares a fingerprint) that plain minhash lacks. "
    "Output: the 20 fingerprints shared by the most documents — the "
    "cross-document plagiarism/boilerplate signal. Scale shape: "
    "k-gramming, hashing, and window minima are HIGHER-ORDER ARRAY "
    "expressions on the let-bound token array — entirely row-local, "
    "zero shuffles, whole-stage codegen — so the only exchanges are "
    "the (doc, fingerprint) and (fingerprint) aggregates, both "
    "map-side combined. No per-token row stream ever exists before "
    "the per-window minima collapse ~w-fold; at 100 TB the shuffled "
    "volume is the fingerprint density (~2/w per token), not the "
    "token count.",
)
def winnow_shared_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_aihw_etl_pipeline_spark.functions.scalar import bind
    from healthcare_aihw_etl_pipeline_spark.operators.search import tokens

    docs = load_table(spark, sf_dir, "documents")

    def _kgram_hashes(t):
        def _h(i):
            gram = F.concat_ws(
                " ",
                F.element_at(t, i + F.lit(1)),
                F.element_at(t, i + F.lit(2)),
                F.element_at(t, i + F.lit(3)),
            )
            return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast(
                "long"
            )

        return F.transform(
            F.sequence(F.lit(0), F.size(t) - F.lit(_WIN_K)), _h
        )

    def _window_minima(h):
        return F.transform(
            F.sequence(F.lit(0), F.size(h) - F.lit(_WIN_W)),
            lambda s: F.array_min(
                F.slice(h, s + F.lit(1), F.lit(_WIN_W))
            ),
        )

    fp = (
        docs.where(F.trim(F.col("text")) != "")
        .where(F.size(tokens("text")) >= _WIN_K + _WIN_W - 1)
        .select(
            "doc_id",
            F.explode(
                bind(
                    bind(tokens("text"), _kgram_hashes), _window_minima
                )
            ).alias("f"),
        )
    )
    perdoc = fp.groupBy("doc_id", "f").agg(F.count(F.lit(1)).alias("c"))
    return (
        perdoc.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("c").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .select(
            F.col("f").alias("fingerprint"),
            "n_docs",
            "n_occurrences",
            "first_doc",
        )
        .orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.col("fingerprint").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes, day grain)

# Slope quantum: integer micro-cents/day. (dy * 10^6) div dx is exact
# in both engines (truncation toward zero matches); |dy| is one day's
# revenue in cents, so dy * 10^6 stays far under 2^63 through sf100.
_TS_SLOPE_QUANT = 1_000_000
_TS_EPOCH = "DATE '1992-01-01'"


@register(
    "theil_sen_daily_trend",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', {_TS_EPOCH}, o_orderdate) AS x,
             SUM({sql_cents('o_totalprice')}) AS r
      FROM orders GROUP BY o_orderdate
    ),
    pairs AS (
      SELECT CAST((b.r - a.r) * {_TS_SLOPE_QUANT} // (b.x - a.x)
                  AS BIGINT) AS sl
      FROM daily a JOIN daily b ON a.x < b.x
    ),
    g AS (SELECT sl, COUNT(*) AS c FROM pairs GROUP BY sl),
    cum AS (
      SELECT sl,
             SUM(c) OVER (ORDER BY sl
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS np
      FROM g
    ),
    med AS (
      SELECT MIN(sl) AS ts_slope, MIN(np) AS np FROM cum
      WHERE cum >= (np + 1) // 2
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(r) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * r) AS BIGINT) AS sxy
      FROM daily
    )
    SELECT m.nd AS n_days,
           CAST(d.np AS BIGINT) AS n_pairs,
           CAST(d.ts_slope AS BIGINT) AS theil_sen_slope_micro,
           (CAST(m.nd AS DOUBLE) * CAST(m.sxy AS DOUBLE)
              - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
             / (CAST(m.nd AS DOUBLE) * CAST(m.sxx AS DOUBLE)
                - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) AS ols_slope
    FROM med d, mom m
    """,
    doc="Theil-Sen robust trend of daily order revenue: the median of "
    "all pairwise slopes (dy/dx over day pairs), the 29%-breakdown "
    "robust alternative to OLS (reported alongside from the same "
    "scan, via the registry's exact-BIGINT-moment pattern). Slopes are "
    "quantized to integer micro-cents/day with truncating integer "
    "division — identical in Spark (div) and DuckDB (//) including "
    "negatives — and the median is the exact lower median via a "
    "cumulative count over the GROUPED slope relation, so no float "
    "ever enters ordering or selection. Scale shape: the pair "
    "relation is day x day — CALENDAR-bounded (~3M pairs for seven "
    "years), constant in corpus size — built as one broadcast "
    "nested-loop pass over the once-materialized day-grain aggregate; "
    "the fact table is scanned exactly once (the day rollup), and the "
    "median's unpartitioned window runs over distinct slope values of "
    "a calendar-bounded set, the same justification as the "
    "Kaplan-Meier and changepoint relations. Overflow bounds: the "
    "BIGINT moments themselves fit through ~sf50 (sxy ~ 8.6e15 at "
    "sf0.1, x10 per decade); the OLS normal-equation PRODUCTS exceed "
    "2^63 already at sf0.1, so each exact moment casts to DOUBLE "
    "BEFORE the products — identical IEEE expression both engines, "
    "and the ~1e-16 relative error lands on a display column, never "
    "in ordering.",
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy("o_orderdate")
        .agg(F.sum(cents("o_totalprice")).alias("r"))
        .select(
            F.datediff(F.col("o_orderdate"), F.expr(_TS_EPOCH))
            .cast("long")
            .alias("x"),
            "r",
        )
        # Day grain: calendar-bounded. Materialize once — the pair pass
        # reads it twice (probe + broadcast build) and the moment
        # aggregate a third time; without this the orders scan reruns
        # per consumer.
        .localCheckpoint(eager=True)
    )
    a = daily.select(F.col("x").alias("xa"), F.col("r").alias("ra"))
    b = daily.select(F.col("x").alias("xb"), F.col("r").alias("rb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("xa") < F.col("xb"))
        .select(
            F.expr(
                f"CAST((rb - ra) * {_TS_SLOPE_QUANT} div (xb - xa)"
                " AS BIGINT)"
            ).alias("sl")
        )
    )
    g = pairs.groupBy("sl").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("sl").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("sl").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "sl",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("np"),
    )
    med = (
        cum.where(F.col("cum") >= F.expr("(np + 1) div 2"))
        .agg(
            F.min("sl").alias("ts_slope"),
            F.min("np").alias("np"),
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").alias("sx"),
        F.sum("r").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("r")).alias("sxy"),
    )
    return med.crossJoin(F.broadcast(mom)).select(
        F.col("nd").alias("n_days"),
        F.col("np").cast("long").alias("n_pairs"),
        F.col("ts_slope").cast("long").alias("theil_sen_slope_micro"),
        (
            (
                F.col("nd").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("nd").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("ols_slope"),
    )
