"""Command-line runner for the query surface.

    python -m healthcare_aihw_etl_pipeline_spark list [substr]
    python -m healthcare_aihw_etl_pipeline_spark run <query> [--sf DIR] [-n N]
    python -m healthcare_aihw_etl_pipeline_spark explain <query> [--sf DIR]
    python -m healthcare_aihw_etl_pipeline_spark sql "<SELECT ...>" [--sf DIR]
    python -m healthcare_aihw_etl_pipeline_spark search "dup spark" [--sf DIR] [-k K]
    python -m healthcare_aihw_etl_pipeline_spark audit [--sf DIR]

`run` prints the result as JSON lines (first N rows, default 50);
`explain` prints the formatted physical plan; `sql` registers the corpus
tables as views and runs arbitrary Spark SQL against them; `search`
runs ad-hoc BM25 retrieval over the documents table for a bag of
whitespace-separated terms (operators/search.bm25_topk); `audit` runs
the release-audit battery (declarative quality rules, k-anonymity
bands, PSI drift, Benford digit law, priority/status dependence) and
prints one combined JSON report.
"""
from __future__ import annotations

import argparse
import json
import sys


def _json_cell(v):
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return f"<{len(v)} bytes>"
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    return v


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="healthcare_aihw_etl_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substr", nargs="?", default="")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("-n", type=int, default=50)
    p_sql = sub.add_parser("sql")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf", default="/root/testdata/sf0.01")
    p_sql.add_argument("-n", type=int, default=50)
    p_search = sub.add_parser("search", help="ad-hoc BM25 over documents")
    p_search.add_argument("terms", help="whitespace-separated query bag")
    p_search.add_argument("--sf", default="/root/testdata/sf0.01")
    p_search.add_argument("-k", type=int, default=10)
    p_audit = sub.add_parser(
        "audit",
        help="run the release-audit battery (quality, k-anonymity, "
        "drift, digit law, dependence) and print one JSON report",
    )
    p_audit.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args(argv)

    from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY

    if args.cmd == "list":
        for q in REGISTRY.values():
            if args.substr in q.name:
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{q.name}  [{kind}]")
        return 0

    from healthcare_aihw_etl_pipeline_spark import get_spark

    spark = get_spark(app_name="cli")
    if args.cmd == "search":
        from healthcare_aihw_etl_pipeline_spark.operators.search import (
            bm25_topk,
        )
        from healthcare_aihw_etl_pipeline_spark.sources.catalog import (
            load_table,
        )

        terms = sorted(set(args.terms.split()))
        docs = load_table(spark, args.sf, "documents")
        for row in bm25_topk(docs, "text", "doc_id", terms, k=args.k).collect():
            print(json.dumps({k: _json_cell(v) for k, v in row.asDict().items()}))
        return 0
    if args.cmd == "audit":
        battery = (
            "data_quality_audit",
            "k_anonymity_audit",
            "value_drift_psi",
            "benford_first_digit_audit",
            "priority_status_mutual_info",
            "revenue_changepoint",
        )
        report = {}
        for name in battery:
            rows = REGISTRY[name].fn(spark, args.sf).collect()
            report[name] = [
                {k: _json_cell(v) for k, v in r.asDict().items()}
                for r in rows
            ]
        print(json.dumps(report, indent=2))
        return 0
    if args.cmd == "sql":
        from healthcare_aihw_etl_pipeline_spark.sources.catalog import (
            register_views,
        )

        register_views(spark, args.sf)
        df = spark.sql(args.statement)
        for row in df.limit(args.n).collect():
            print(json.dumps({k: _json_cell(v) for k, v in row.asDict().items()}))
        return 0

    q = REGISTRY.get(args.query)
    if q is None:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    df = q.fn(spark, args.sf)
    if args.cmd == "explain":
        qe = df._jdf.queryExecution()
        mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(qe.explainString(mode))
        return 0
    for row in df.limit(args.n).collect():
        print(json.dumps({k: _json_cell(v) for k, v in row.asDict().items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
