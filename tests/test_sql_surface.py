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
