"""Discovery-source and scalar-function unit tests (SURVEY §2.1 S1/S2/S5,
§2.9 X1-X5) — all offline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_aihw_etl_pipeline_spark.functions.scalar import (
    clean_text,
    norm_state,
    slug,
    try_double,
    year_from_url,
)
from healthcare_aihw_etl_pipeline_spark.sources import discovery

HTML = """
<html><body>
<a href="/getmedia/abc/4-admitted-patient-care-2022-23-tables-access.xlsx">latest</a>
<a href="https://example.org/other/admitted-patient-care-2021-22-tables-access.xlsx">old</a>
<a href="/reports/some-other-report-tables-access.xlsx">unrelated</a>
<a href="/admitted-patient-care/page.html">not a workbook</a>
</body></html>
"""


def test_extract_links():
    links = discovery.extract_links(HTML)
    assert links == [
        "https://www.aihw.gov.au/getmedia/abc/4-admitted-patient-care-2022-23-tables-access.xlsx",
        "https://example.org/other/admitted-patient-care-2021-22-tables-access.xlsx",
    ]


def test_discover_fallback_on_failure():
    def boom(url):
        raise OSError("offline")

    assert discovery.discover_excels(boom) == discovery.FALLBACK_LINKS
    assert discovery.discover_excels(None) == discovery.FALLBACK_LINKS
    assert discovery.discover_excels(lambda u: HTML)[0].endswith("tables-access.xlsx")


def test_sheet_name_filter():
    assert discovery.sheet_name_wanted("Table 4.1")
    assert discovery.sheet_name_wanted("table S2")
    assert discovery.sheet_name_wanted("Table5")
    assert not discovery.sheet_name_wanted("Table 3")
    assert not discovery.sheet_name_wanted("Notes")


def test_slug():
    assert slug("  Care Type ") == "care_type"
    assert slug("Unnamed: 0") == "unnamed:_0"


def test_scalar_columns(spark):
    df = spark.createDataFrame(
        [
            ("n.s.w.", '("Injury", 1.0)', "1,234", "https://x/4-apc-2022-23-tables-access.xlsx"),
            ("Total", '"Cancer"', " 7.5 ", "https://x/no-year.xlsx"),
        ],
        ["state_raw", "dim_raw", "num_raw", "url"],
    )
    rows = df.select(
        norm_state("state_raw").alias("st"),
        clean_text("dim_raw").alias("dim"),
        try_double("num_raw").alias("num"),
        year_from_url("url").alias("yr"),
    ).collect()
    assert (rows[0].st, rows[0].dim, rows[0].num, rows[0].yr) == ("NSW", "Injury", None, 2023)
    assert (rows[1].st, rows[1].dim, rows[1].num, rows[1].yr) == (None, "Cancer", 7.5, 9999)


def test_excel_roundtrip_if_openpyxl():
    openpyxl = pytest.importorskip("openpyxl")
    from io import BytesIO

    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = "Table 4.1"
    ws.append(["", "", "NSW", "VIC"])
    ws.append(["Injury", "X", 1, 2])
    wb.create_sheet("Notes").append(["ignore me"])
    buf = BytesIO()
    wb.save(buf)

    sheets = discovery.excel_to_sheets(buf.getvalue())
    assert len(sheets) == 1
    name, rows = sheets[0]
    assert name == "Table 4.1"
    assert rows[0][2] == "NSW" and rows[1][0] == "Injury"


def test_spread_guard(spark, tmp_path):
    """spread() repartitions a few-file scan to defaultParallelism and
    leaves a many-file scan untouched (no extra shuffle at real file
    counts)."""
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import spread

    n = spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(one)
    df1 = spark.read.parquet(one)
    assert spread(df1).rdd.getNumPartitions() == n

    many = str(tmp_path / "many")
    spark.range(1000).repartition(n + 4).write.parquet(many)
    df2 = spark.read.parquet(many)
    assert spread(df2) is df2  # untouched: enough files already


def test_table_rows_serves_footer_statistics(spark, sf_dir):
    """catalog.table_rows is the metastore statistic the stats-guarded
    plans read: exact, cached, and computed without a Spark job."""
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import table_rows

    n = table_rows(sf_dir, "orders")
    assert n == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert table_rows(sf_dir, "orders") is not None  # cache hit path
    assert table_rows(sf_dir, "no_such_table") is None
