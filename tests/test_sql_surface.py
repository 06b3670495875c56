"""SQL surface (SURVEY §7.1c — redeeming the reference's unused pandasql
intent, /root/reference/requirements.txt:12) and sink round-trips."""

from __future__ import annotations

from healthcare_aihw_etl_pipeline_spark.sources.catalog import register_views
from healthcare_aihw_etl_pipeline_spark.sources.sinks import read_table, write_table


def test_spark_sql_over_views(spark, sf_dir, duck):
    register_views(spark, sf_dir)
    sql = """
      SELECT o_orderstatus, COUNT(*) AS n
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1997
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """
    got = [(r[0], r[1]) for r in spark.sql(sql).collect()]
    want = duck.execute(sql).fetchall()
    assert got == [tuple(r) for r in want]


def test_write_table_overwrite_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_copy")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_table(nation, path, partition_by=["n_regionkey"])
    assert read_table(spark, path).count() == nation.count()

    # full-replace contract: a second overwrite leaves exactly the new data
    subset = nation.where("n_regionkey = 0")
    write_table(subset, path, partition_by=["n_regionkey"])
    assert read_table(spark, path).count() == subset.count()

    # partition pruning: reading one partition only lists that directory
    pruned = read_table(spark, path).where("n_regionkey = 0")
    assert pruned.count() == subset.count()


def test_write_table_formats_roundtrip(spark, sf_dir, tmp_path):
    """ORC/JSON/CSV sinks round-trip values under an explicit schema
    (inference-free — the production path)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    want = sorted(tuple(r) for r in nation.collect())
    for fmt in ("orc", "json", "csv"):
        path = str(tmp_path / f"nation_{fmt}")
        write_table(nation, path, fmt=fmt)
        got = read_table(spark, path, fmt=fmt, schema=nation.schema)
        assert sorted(tuple(r) for r in got.collect()) == want, fmt


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter on
    the file scan (pruning at file-listing time), not a post-scan
    Filter — the property that makes date-partitioned 100 TB layouts
    queryable."""
    path = str(tmp_path / "events_by_type")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    write_table(events, path, partition_by=["event_type"])
    pruned = read_table(spark, path).where("event_type = 'click'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]


def test_upsert_partitions_replaces_only_matching(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: the incremental batch replaces only
    its own partitions; untouched partitions keep their original rows."""
    from healthcare_aihw_etl_pipeline_spark.sources.sinks import upsert_partitions

    path = str(tmp_path / "events_parts")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    write_table(events, path, partition_by=["event_type"])
    before = {
        r.event_type: r.n
        for r in read_table(spark, path)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }

    # incremental load: clicks only, halved
    clicks_half = events.where("event_type = 'click' AND event_id % 2 = 0")
    n_half = clicks_half.count()
    upsert_partitions(clicks_half, path, ["event_type"])

    after = {
        r.event_type: r.n
        for r in read_table(spark, path)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert after["click"] == n_half != before["click"]
    for et in before:
        if et != "click":
            assert after[et] == before[et], et
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").upper()
        == "STATIC"
    )


def test_write_table_observed_one_pass_metrics(spark, sf_dir, tmp_path):
    """observe() metrics match a direct aggregation, collected from the
    WRITE job itself (no second scan)."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table
    from healthcare_aihw_etl_pipeline_spark.sources.sinks import (
        write_table_observed,
    )

    events = load_table(spark, str(sf_dir), "events").select(
        "event_id", "event_type", "value"
    )
    got = write_table_observed(
        events,
        str(tmp_path / "obs"),
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_value": F.count(F.when(F.col("value").isNull(), 1)),
            "sum_value_cents": F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ),
        },
    )
    want = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_value_cents"
        ),
    ).first()
    assert got["n_rows"] == want["n_rows"]
    assert got["n_null_value"] == want["n_null_value"]
    assert got["sum_value_cents"] == want["sum_value_cents"]
    # and the write itself landed
    assert spark.read.parquet(str(tmp_path / "obs")).count() == want["n_rows"]


def test_cli_list_run_explain(spark, sf_dir, capsys):
    """The __main__ CLI covers list / run / explain / sql in-process
    (reusing the test session via the singleton)."""
    import json as _json

    from healthcare_aihw_etl_pipeline_spark.__main__ import main

    assert main(["list", "pricing"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary  [oracle]" in out

    assert main(["run", "pricing_summary", "--sf", sf_dir, "-n", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 1 <= len(lines) <= 2
    assert "l_returnflag" in _json.loads(lines[0])

    assert main(["explain", "pricing_summary", "--sf", sf_dir]) == 0
    assert "HashAggregate" in capsys.readouterr().out

    assert main(["sql", "SELECT COUNT(*) AS n FROM nation", "--sf", sf_dir]) == 0
    assert _json.loads(capsys.readouterr().out.strip())["n"] == 25

    assert main(["run", "nope"]) == 2

    assert main(["search", "dup spark", "--sf", sf_dir, "-k", "3"]) == 0
    hits = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.strip()
    ]
    assert 1 <= len(hits) <= 3
    assert {"doc_id", "score_q", "score"} <= set(hits[0])


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """S6/S7 JDBC legs (write_jdbc / read_jdbc — the reference's
    to_sql/read_sql surface, /root/reference/main.py:155-165,
    streamlit_app.py:30) exercised against embedded Derby, whose driver
    ships in Spark's own jars directory. Covers: overwrite write with
    batching, table scan, pushdown query scan, and that a second
    overwrite REPLACES (the reference's if_exists='replace')."""
    import pytest

    from healthcare_aihw_etl_pipeline_spark.sources.sinks import (
        read_jdbc,
        write_jdbc,
    )

    # Keep Derby's droppings (derby.log) out of the repo root the
    # driver snapshots: derby.system.home must be set before the engine
    # boots (first Class.forName), and it is sticky for the JVM's life.
    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
    except Exception:
        pytest.skip("no embedded Derby JDBC driver on the Spark classpath")

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    cols = ["event_id", "event_type", "value"]
    df = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0), (3, "click", 3.0)], cols
    )
    # Derby maps StringType to CLOB, which can't be GROUP BY'd — pin a
    # comparable SQL type for the string column (the writer's
    # createTableColumnTypes escape hatch, part of the S7 surface).
    write_opts = {**opts, "createTableColumnTypes": "event_type VARCHAR(32)"}
    write_jdbc(df, url, "events_t", batchsize=2, options=write_opts)

    back = read_jdbc(spark, url, table="events_t", options=opts)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )

    agg = read_jdbc(
        spark,
        url,
        # Derby uppercases unquoted identifiers while Spark's JDBC
        # writer creates quoted lowercase columns — quote them in the
        # pushdown query.
        query=(
            'SELECT "event_type", COUNT(*) AS "n" FROM events_t '
            'GROUP BY "event_type"'
        ),
        options=opts,
    )
    assert sorted((r.event_type, r.n) for r in agg.collect()) == [
        ("click", 2), ("view", 1)
    ]

    # overwrite replaces, not appends
    df2 = spark.createDataFrame([(9, "purchase", 9.0)], cols)
    write_jdbc(df2, url, "events_t", options=write_opts)
    assert [tuple(r) for r in
            read_jdbc(spark, url, table="events_t", options=opts).collect()
            ] == [(9, "purchase", 9.0)]


def test_cli_audit_battery(spark, sf_dir, capsys):
    """`audit` prints one JSON report with every audit section
    populated."""
    import json as _json

    from healthcare_aihw_etl_pipeline_spark.__main__ import main

    assert main(["audit", "--sf", sf_dir]) == 0
    report = _json.loads(capsys.readouterr().out)
    assert set(report) == {
        "data_quality_audit",
        "k_anonymity_audit",
        "value_drift_psi",
        "benford_first_digit_audit",
        "priority_status_mutual_info",
        "revenue_changepoint",
    }
    assert all(report[k] for k in report)
    assert {"digit", "observed", "expected", "chi2_contrib_q"} <= set(
        report["benford_first_digit_audit"][0]
    )
