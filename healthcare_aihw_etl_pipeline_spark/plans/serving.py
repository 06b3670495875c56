"""Concurrent query serving: run a set of registered queries as one
overlapped wave.

A suite of independent queries run back-to-back on one thread pays the
per-job scheduling floor (~30-60 ms/job in local mode; DAG submission +
task round-trips on a cluster) once per JOB. Spark's scheduler is fully
concurrent — separate actions from separate threads interleave at task
granularity — so a serving layer submits them together and pays the
floor once per WAVE. This module is that serving layer as an engine
API (bench.py uses the same shape for its headline metric): plans are
pre-resolved single-threaded (plan construction is py4j/Catalyst work
that would contend on the analyzer), then collected from a bounded
thread pool.

At 100 TB the same structure holds: a dashboard/report tier issuing N
independent queries against one SparkSession overlaps them; total
latency approaches max(query) + floor instead of sum(query + floor).
FAIR scheduling can be layered via spark.scheduler.mode for fairness
between long and short queries; FIFO (default) already interleaves
tasks of small queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from healthcare_aihw_etl_pipeline_spark.plans.registry import REGISTRY


def collect_wave(
    spark: SparkSession,
    names: Sequence[str],
    sf_dir: str,
    *,
    max_workers: int | None = None,
    fresh_plans: bool = False,
) -> dict[str, list]:
    """Run the named registered queries concurrently; return
    {name: collected rows}.

    Plans resolve through the registry's prepared-statement cache
    (pass ``fresh_plans=True`` to force new physical plans — new
    shuffle ids, full re-execution; this is what a benchmark wants,
    while a serving tier wants the default). Collection overlaps in a
    thread pool of ``max_workers`` (default: one per query, capped at
    16 — beyond the core budget extra threads only add GIL traffic).

    Results and errors are per-query: one failing query raises AFTER
    the others finish (the pool drains), with the query name attached.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    missing = [n for n in names if n not in REGISTRY]
    if missing:
        raise KeyError(f"unknown queries: {missing}")
    if not names:
        return {}
    dfs = []
    for n in names:
        df = REGISTRY[n].fn(spark, sf_dir)
        if fresh_plans:
            df = df.where(F.lit(True))
        dfs.append((n, df))
    # max(1, ...): ThreadPoolExecutor rejects max_workers=0.
    workers = max(1, max_workers or min(len(dfs), 16))

    def run(pair):
        n, df = pair
        try:
            return n, df.collect(), None
        except Exception as e:  # surfaced after the wave drains
            return n, None, e

    out: dict[str, list] = {}
    first_err: tuple[str, Exception] | None = None
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for n, rows, err in ex.map(run, dfs):
            if err is not None:
                first_err = first_err or (n, err)
            else:
                out[n] = rows
    if first_err is not None:
        n, err = first_err
        raise RuntimeError(f"query {n!r} failed in wave") from err
    return out
