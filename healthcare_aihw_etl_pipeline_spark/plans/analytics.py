"""Dashboard-serving analytics (SURVEY §3.2) — the reference's Streamlit
query path (/root/reference/streamlit_app.py) as an engine API over any
tidy fact DataFrame.

The reference recomputes a pandas groupby per widget per interaction
(A3–A10); here the serving pattern is: load → harmonize → persist once
(C2), then lazy per-widget aggregations, or one cube pass serving every
widget grain (supersedes the eight re-scans).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from healthcare_aihw_etl_pipeline_spark.operators.relational import (
    FIXED_COLS,
    dims_of,
    distinct_domain,
    top_k,
)
from healthcare_aihw_etl_pipeline_spark.operators.reshape import pivot_sum
from healthcare_aihw_etl_pipeline_spark.operators.windows import (
    argmax_row,
    first_last_pct_change,
)
from healthcare_aihw_etl_pipeline_spark.functions.scalar import STATE_CODES, try_double, try_int

MEASURE = "separations"


def harmonize(df: DataFrame) -> DataFrame:
    """P5/X3/X4/F3 — the reference's load-time cleanup
    (/root/reference/streamlit_app.py:39-49): harmonizing renames
    (diagnosis→principal_diagnosis, icd_chapter→category when absent),
    dtype coercion, and the fixed-column null-drop."""
    if "diagnosis" in df.columns and "principal_diagnosis" not in df.columns:
        df = df.withColumnRenamed("diagnosis", "principal_diagnosis")
    if "icd_chapter" in df.columns and "category" not in df.columns:
        df = df.withColumnRenamed("icd_chapter", "category")
    df = df.withColumn("year", try_int("year")).withColumn(MEASURE, try_double(MEASURE))
    return df.na.drop(subset=["year", "state", MEASURE])


def serve(df: DataFrame) -> DataFrame:
    """C2 — persist the harmonized base frame once; every widget
    aggregation below re-reads it from memory (`st.cache_data`,
    /root/reference/streamlit_app.py:26-27)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


# Widget aggregations A3-A10 (/root/reference/streamlit_app.py:82-147).


def state_bar(df: DataFrame) -> DataFrame:
    """A6 — total measure by state."""
    return df.groupBy("state").agg(F.sum(MEASURE).alias(MEASURE))


def year_trend(df: DataFrame) -> DataFrame:
    """A7 — year × state trend lines."""
    return df.groupBy("year", "state").agg(F.sum(MEASURE).alias(MEASURE))


def category_top10(df: DataFrame) -> DataFrame:
    """A8 + O3 — top-10 categories pie input."""
    agg = df.groupBy("category").agg(F.sum(MEASURE).alias(MEASURE))
    return top_k(agg, MEASURE, 10, tiebreak=["category"])


def category_state_heatmap(df: DataFrame) -> DataFrame:
    """A9 + R2 — category × state matrix with the fixed state domain."""
    return pivot_sum(df, "category", "state", STATE_CODES, MEASURE)


def treemap(df: DataFrame) -> DataFrame:
    """A10 — two-level category / principal_diagnosis rollup."""
    return df.groupBy("category", "principal_diagnosis").agg(
        F.sum(MEASURE).alias(MEASURE)
    )


def widget_cube(df: DataFrame) -> DataFrame:
    """One cube pass over (year, state, category) serving the A3-A9 grains
    with grouping-id to select a widget's slice — replaces eight separate
    fact scans with one (SURVEY §4.2 candidate extension #1)."""
    return (
        df.cube("year", "state", "category")
        .agg(F.sum(MEASURE).alias(MEASURE), F.grouping_id().alias("grain"))
    )


@dataclass(frozen=True)
class Insights:
    top_state: str | None
    top_state_total: float | None
    top_category: str | None
    top_category_total: float | None
    first_year: int | None
    last_year: int | None
    pct_change: float | None

    def lines(self) -> list[str]:
        out = []
        if self.top_state is not None:
            out.append(
                f"{self.top_state} shows the highest {MEASURE} in the current "
                f"view (~{int(self.top_state_total):,})."
            )
        if self.top_category is not None:
            out.append(
                f"Leading category: {self.top_category} "
                f"(~{int(self.top_category_total):,})."
            )
        if self.pct_change is not None:
            trend = "increased" if self.pct_change > 0 else "decreased"
            out.append(
                f"Overall {MEASURE} have {trend} {abs(self.pct_change):.1f}% "
                f"from {self.first_year} to {self.last_year}."
            )
        return out


def generate_insights(df: DataFrame) -> Insights | None:
    """The insight generator (/root/reference/streamlit_app.py:78-104):
    top state (W2), top category (W2), first→last pct change (W1) — three
    aggregations instead of the reference's sort-and-take-head passes.
    F10 empty guards via isEmpty()."""
    if df.isEmpty():
        return None

    ts = argmax_row(state_bar(df), "state", MEASURE).first()
    top_cat = None
    if "category" in df.columns:
        top_cat = argmax_row(
            df.groupBy("category").agg(F.sum(MEASURE).alias(MEASURE)),
            "category",
            MEASURE,
        ).first()

    pct = None
    if df.select("year").distinct().limit(2).count() > 1:
        yearly = df.groupBy("year").agg(F.sum(MEASURE).alias(MEASURE))
        pct = first_last_pct_change(yearly, "year", MEASURE).first()

    return Insights(
        top_state=ts["state"] if ts else None,
        top_state_total=ts[MEASURE] if ts else None,
        top_category=top_cat["category"] if top_cat else None,
        top_category_total=top_cat[MEASURE] if top_cat else None,
        first_year=pct["first_year"] if pct else None,
        last_year=pct["last_year"] if pct else None,
        pct_change=pct["pct_change"] if pct else None,
    )


def _domains_one_pass(
    df: DataFrame, cols: list[str], *, cap: int
) -> dict[str, list]:
    """Sorted distinct values for many columns in ONE aggregation job.

    Per column: sort_array(collect_set(c)) sliced to `cap` elements —
    collect_set drops NULLs (matching distinct_domain), the slice bounds
    the driver transfer, and a result of exactly `cap` values signals
    "domain ≥ cap" to the caller. Empty strings are excluded INSIDE the
    aggregate (when(c != '', c) nulls them out before collect_set) so the
    cap-slice count reflects the non-empty domain — filtering after the
    slice would let a ≥cap domain plus '' shrink to cap-1 and slip past
    the cardinality guard.

    The round-1 shape was one distinct().collect() job PER column — N
    full column scans and N driver round-trips per interaction; this is
    one scan for every normally-sized column regardless of column count.

    Extreme cardinality is pre-gated: collect_set buffers the FULL
    distinct set in every partial-aggregation buffer before the slice, so
    a single 10^6-distinct dim would blow executor aggregation memory at
    scale. A first constant-memory pass (HLL++ approx_count_distinct,
    rsd=2%) routes any column whose estimate clears 1.3x the cap to a
    shuffle-based distinct+orderBy+limit job instead — hash-exchange
    aggregation spills to disk and the limit bounds the driver transfer,
    so no executor ever holds the domain in one buffer. The 1.3x margin
    is far beyond HLL error at rsd=2%, and both paths return the first
    `cap` values in sort order, so the cardinality-guard contract
    (len == cap ⇒ "domain ≥ cap") is unchanged. All guarded dims that
    fit the cap still share ONE collect_set job.
    """
    if not cols:
        return {}
    dtypes = dict(df.dtypes)

    def guarded(c: str) -> Column:
        return (
            F.when(F.col(c) != "", F.col(c))
            if dtypes.get(c) == "string"
            else F.col(c)
        )

    over = _gate_over_cap(df, cols, cap, guarded)
    small = [c for c in cols if c not in over]
    out: dict[str, list] = {}
    if small:
        row = df.agg(
            *[
                F.slice(F.sort_array(F.collect_set(guarded(c))), 1, cap).alias(c)
                for c in small
            ]
        ).first()
        out.update({c: list(row[c]) for c in small})
    for c in over:
        vals = (
            df.select(guarded(c).alias(c))
            .where(F.col(c).isNotNull())
            .distinct()
            .orderBy(c)
            .limit(cap)
            .collect()
        )
        out[c] = [r[c] for r in vals]
    return out


def _gate_over_cap(
    df: DataFrame, cols: list[str], cap: int, guarded: Callable[[str], Column]
) -> set[str]:
    """Columns whose approximate distinct count exceeds 1.3x `cap` —
    unsafe for a collect_set buffer, served by distinct+limit instead."""
    gate = df.agg(
        *[F.approx_count_distinct(guarded(c), 0.02).alias(c) for c in cols]
    ).first()
    return {c for c in cols if gate[c] > 1.3 * cap}


def interactive_filter(
    df: DataFrame,
    selections: dict[str, list],
    *,
    max_domain: int = 50,
) -> DataFrame:
    """F4/F5/F6 — the sidebar filter model
    (/root/reference/streamlit_app.py:54-74): apply an IN-list per selected
    column, skipping no-op selections (selection == full domain), with the
    cardinality guard for dynamic dims. All guarded domains come from ONE
    aggregation job (not one per column)."""
    guarded = [
        col
        for col, sel in selections.items()
        if col in df.columns and sel and col not in FIXED_COLS | {"year", "state"}
    ]
    domains = _domains_one_pass(df, guarded, cap=max_domain)
    pred = None
    for col, sel in selections.items():
        if col not in df.columns or not sel:
            continue
        if col in domains:
            domain = domains[col]
            if not (1 < len(domain) < max_domain) or len(sel) == len(domain):
                continue
        p = F.col(col).isin(list(sel))
        pred = p if pred is None else (pred & p)
    return df.where(pred) if pred is not None else df


def filter_domains(df: DataFrame, *, max_domain: int = 50) -> dict[str, list]:
    """A12/F6/F7 — the widget domains: sorted distinct values per dynamic
    dim with 1 < n < max_domain, plus year/state
    (/root/reference/streamlit_app.py:57-69). One aggregation job
    regardless of column count (round 1 issued one per column)."""
    cols = [c for c in ["year", "state", *dims_of(df)] if c in df.columns]
    # year/state domains are small by nature but have no 1<n<max guard, so
    # cap them generously; dynamic dims cap at max_domain (a full slice ⇒
    # domain too large ⇒ dropped below, preserving the exact guard).
    cap = max(max_domain, 1000)
    domains = _domains_one_pass(df, cols, cap=cap)
    out: dict[str, list] = {}
    for col, vals in domains.items():
        if col in ("year", "state") or 1 < len(vals) < max_domain:
            out[col] = vals
    return out


def profile(df: DataFrame) -> DataFrame:
    """Dataset profiling (the reference's ydata-profiling EDA feature,
    /root/reference/streamlit_app.py:204-209, minimal mode) as one
    aggregation pass: per column — non-null count, null count, approx
    distinct, and for numeric columns min/max/mean.

    Output: one row per column (column, dtype, n_non_null, n_null,
    approx_distinct, min_value, max_value, mean_value as strings).
    A single job regardless of column count; at scale this is one scan.
    """
    numeric = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}
    # Total row count rides in the SAME aggregation — a separate
    # df.count() would scan the data twice.
    aggs = [F.count(F.lit(1)).alias("__total")]
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        aggs.append(F.count(F.col(name)).alias(f"{name}__cnt"))
        aggs.append(F.approx_count_distinct(name).alias(f"{name}__dist"))
        if base in numeric:
            aggs.append(F.min(name).cast("string").alias(f"{name}__min"))
            aggs.append(F.max(name).cast("string").alias(f"{name}__max"))
            aggs.append(F.round(F.avg(name), 6).cast("string").alias(f"{name}__mean"))
    row = df.agg(*aggs).first()
    total = row["__total"]
    spark = df.sparkSession
    out = []
    for name, dtype in df.dtypes:
        cnt = row[f"{name}__cnt"]
        out.append(
            (
                name,
                dtype,
                cnt,
                total - cnt,
                row[f"{name}__dist"],
                row.asDict().get(f"{name}__min"),
                row.asDict().get(f"{name}__max"),
                row.asDict().get(f"{name}__mean"),
            )
        )
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_non_null long, n_null long, "
        "approx_distinct long, min_value string, max_value string, mean_value string",
    )
