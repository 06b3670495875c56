"""Round-11 operator tests: Pareto skyline (vs brute-force dominance),
sweep-line concurrency (vs point-in-interval counting), largest-remainder
apportionment invariants, Poisson-bootstrap determinism and statistical
sanity, and k-means refinement invariants (vs an independent numpy
replication of the quantized algorithm)."""

import duckdb
import numpy as np

from healthcare_aihw_etl_pipeline_spark.plans import REGISTRY


SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return REGISTRY[name].build(spark, sf).collect()


def test_skyline_matches_bruteforce_dominance(spark):
    """The two-phase windowed skyline must equal the O(n^2) dominance
    definition evaluated directly (NOT EXISTS dominator) in DuckDB."""
    got = {
        (r.o_orderkey, r.order_day, r.price_c)
        for r in _rows(spark, "skyline_orders")
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH pts AS (
              SELECT o_orderkey,
                     CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS d,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS p
              FROM '{SF}/orders.parquet'
            )
            SELECT a.o_orderkey, a.d, a.p FROM pts a
            WHERE NOT EXISTS (
              SELECT 1 FROM pts b
              WHERE b.d <= a.d AND b.p >= a.p
                AND (b.d < a.d OR b.p > a.p)
            )
            """
        ).fetchall()
    }
    assert got == want
    assert len(got) > 0


def test_skyline_is_antichain(spark):
    """No skyline point may dominate another (antichain property): on
    the (earliest-date, highest-price) frontier a later point survives
    only by strictly beating every earlier price, so sorted by day the
    prices are strictly increasing across distinct days."""
    rows = sorted(
        ((r.order_day, r.price_c) for r in _rows(spark, "skyline_orders"))
    )
    for (d1, p1), (d2, p2) in zip(rows, rows[1:]):
        if d1 < d2:
            assert p2 > p1, "later skyline day must strictly beat the price"
        else:
            assert d1 == d2 and p1 == p2, (
                "same-day skyline points can only be exact price ties"
            )


def test_max_concurrent_matches_point_counting(spark):
    """Peak concurrency per day must equal the max over boundary
    instants of #intervals covering that instant (closed intervals),
    computed independently in DuckDB."""
    got = {r.day: (r.n_sessions, r.max_concurrent)
           for r in _rows(spark, "max_concurrent_sessions")}
    want = {}
    for day, ns, mc in duckdb.sql(
        f"""
        WITH iv AS (
          SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) s, MAX(ts) e
          FROM '{SF}/events.parquet' GROUP BY 1, 2
        ),
        pts AS (SELECT DISTINCT day, s AS t FROM iv
                UNION SELECT DISTINCT day, e FROM iv),
        cov AS (
          SELECT p.day, p.t, COUNT(*) AS c
          FROM pts p JOIN iv ON iv.day = p.day
                     AND iv.s <= p.t AND p.t <= iv.e
          GROUP BY p.day, p.t
        )
        SELECT c.day, n.n_sessions, MAX(c.c)
        FROM cov c JOIN (SELECT day, COUNT(*) n_sessions FROM iv
                         GROUP BY day) n USING (day)
        GROUP BY c.day, n.n_sessions
        """
    ).fetchall():
        want[str(day)] = (ns, mc)
    assert got == want


def test_largest_remainder_exact_budget(spark):
    from healthcare_aihw_etl_pipeline_spark.plans.round11_queries import (
        _ALLOC_SEATS,
    )

    rows = _rows(spark, "largest_remainder_allocation")
    assert sum(r.final_alloc for r in rows) == _ALLOC_SEATS
    bumps = [r.final_alloc - r.floor_alloc for r in rows]
    assert set(bumps) <= {0, 1}, "largest-remainder adds at most one seat"
    assert all(r.final_alloc >= 0 for r in rows)


def test_poisson_bootstrap_deterministic_and_sane(spark):
    a = _rows(spark, "poisson_bootstrap_order_value")[0]
    b = _rows(spark, "poisson_bootstrap_order_value")[0]
    assert a == b, "md5-driven bootstrap must be bit-reproducible"
    assert a.n_replicas == 32
    # Statistical sanity: the bootstrap SE of the mean should sit near
    # the analytic SE = sd/sqrt(n) (within a generous 3x band — 32
    # replicas is a noisy variance estimate, but not 10x-noisy).
    sd, n = duckdb.sql(
        f"""SELECT stddev_samp(CAST(round(o_totalprice*100) AS BIGINT)),
                   COUNT(*) FROM '{SF}/orders.parquet'"""
    ).fetchone()
    analytic_cc = float(sd) / float(n) ** 0.5 * 100  # centicents
    assert analytic_cc / 3 < a.boot_se_centicents < analytic_cc * 3


def _numpy_kmeans_reference(sf=SF):
    """Independent replication of the quantized 2-iteration Lloyd
    refinement in numpy (third implementation, no Spark, no SQL)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet")
    vec_ids = np.asarray(t["vec_id"].to_pylist())
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vec_ids)
    vec_ids, X = vec_ids[order], X[order]
    K, Q, DQ = 8, 1_048_576, 1e9

    def dist_q(X, C):
        # (n, k) integer-quantized squared distances
        d = X[:, None, :] - C[None, :, :]
        return np.floor(d * d * DQ + 0.5).astype(np.int64).sum(axis=2)

    C = X[vec_ids < K]
    cids = vec_ids[vec_ids < K]
    for it in range(2):
        dq = dist_q(X, C)
        assign = cids[np.argmin(dq, axis=1)]  # ties: lowest cluster id
        if it == 1:
            out = {}
            for j, c in enumerate(cids):
                m = assign == c
                if m.any():
                    out[int(c)] = (
                        int(m.sum()),
                        int(dq[m, j].sum()),
                        int(
                            np.floor(C[j] * C[j] * DQ + 0.5)
                            .astype(np.int64)
                            .sum()
                        ),
                    )
            return out
        newC, newids = [], []
        for c in sorted(set(cids)):
            m = assign == c
            if not m.any():
                continue
            xq = np.floor(X[m] * Q + 0.5).astype(np.int64)
            newC.append(xq.sum(axis=0) / float(m.sum()) / Q)
            newids.append(c)
        C, cids = np.array(newC), np.array(newids)


def test_kmeans_matches_numpy_reference(spark):
    got = {
        r.cluster: (r.n_members, r.inertia_q, r.centroid_norm2_q)
        for r in _rows(spark, "kmeans_refine_clusters")
    }
    want = _numpy_kmeans_reference()
    assert got == want
    assert sum(v[0] for v in got.values()) == duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0], "clusters must partition the vector set"


def test_kmeans_argmin_tie_goes_to_lowest_cluster(spark):
    """Duplicate seed vectors produce exact integer distance ties; the
    min(struct(dist, cluster)) aggregate must pick the lowest cluster
    id, matching the oracle's ROW_NUMBER ordering."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.plans.round11_queries import (
        _km_dist_q,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.25])],
        "vec_id bigint, ev array<double>",
    )
    c = df.selectExpr("vec_id as cluster", "ev as cv")
    d = df.crossJoin(c).select(
        "vec_id", "cluster", _km_dist_q(F.col("ev"), F.col("cv")).alias("dq")
    )
    picked = {
        r.vec_id: r.m.cluster
        for r in d.groupBy("vec_id")
        .agg(F.min(F.struct("dq", "cluster")).alias("m"))
        .collect()
    }
    # vec 0 and 1 are identical → both tie between clusters 0 and 1 at
    # distance 0 → both must land in cluster 0.
    assert picked[0] == 0 and picked[1] == 0 and picked[2] == 2


def test_golden_record_members_partition_and_nation_pure(spark):
    """Entity clusters must (a) partition the customer set and (b) be
    nation-pure (every match edge respects the nation block, so closure
    cannot cross nations). Checked via the operator's full output, not
    the top-20 query view."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    cust = load_table(spark, SF, "customer")
    a, b = cust.alias("a"), cust.alias("b")
    edges = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(F.col("a.c_custkey").alias("src"), F.col("b.c_custkey").alias("dst"))
    cc = connected_components(edges, src="src", dst="dst")
    assigned = cust.join(cc, cust["c_custkey"] == cc["node"], "left").select(
        "c_custkey", "c_nationkey",
        F.coalesce("component", "c_custkey").alias("component"),
    )
    n_cust = cust.count()
    assert assigned.count() == n_cust  # partition: every customer once
    impure = (
        assigned.groupBy("component")
        .agg(F.countDistinct("c_nationkey").alias("nn"))
        .where(F.col("nn") > 1)
        .count()
    )
    assert impure == 0
    # and the registry view agrees with the biggest clusters
    top = _rows(spark, "golden_record_customers")
    sizes = [r.n_members for r in top]
    assert sizes == sorted(sizes, reverse=True)
    assert all(r.golden_name.startswith("Customer#") for r in top)


def test_twap_bounded_by_minmax_and_exact_span(spark):
    """TWAP is a convex combination of the day's values, so it must sit
    within [min, max] value-cents; span_us must equal last-first epoch
    micros exactly (independent DuckDB computation)."""
    rows = _rows(spark, "twap_event_value")
    bounds = {
        str(d): (lo, hi, span)
        for d, lo, hi, span in duckdb.sql(
            f"""
            SELECT CAST(ts AS DATE),
                   MIN(CAST(round(value*100) AS BIGINT)),
                   MAX(CAST(round(value*100) AS BIGINT)),
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts))
            FROM '{SF}/events.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    assert len(rows) == len(bounds)
    for r in rows:
        lo, hi, span = bounds[r.day]
        assert r.span_us == span
        if r.twap_c is not None:
            assert lo <= r.twap_c <= hi
        assert lo <= r.mean_c <= hi


def test_interval_coverage_identities(spark):
    """Fubini identity: the concurrency integral equals the plain sum
    of span lengths; the union length never exceeds it and equals it
    only when no spans overlap."""
    rows = _rows(spark, "interval_union_coverage")
    assert rows
    for r in rows:
        assert r.user_us_integral == r.total_session_us
        assert 0 <= r.covered_us <= r.total_session_us


def test_symmetric_delete_blocking_is_complete(spark):
    """The SymSpell candidate generator must produce EXACTLY the
    brute-force lev<=1 edge set — including insertion/deletion pairs of
    differing lengths, which naive fixed-position blocking misses."""
    from pyspark.sql import functions as F

    from healthcare_aihw_etl_pipeline_spark.plans.round11_queries import (
        _symmetric_delete_edges,
    )
    from healthcare_aihw_etl_pipeline_spark.sources.catalog import load_table

    def brute(df):
        a, b = df.alias("a"), df.alias("b")
        return {
            (r.src, r.dst)
            for r in a.join(
                b,
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .select(
                F.col("a.c_custkey").alias("src"),
                F.col("b.c_custkey").alias("dst"),
            )
            .collect()
        }

    cust = load_table(spark, SF, "customer")
    got = {(r.src, r.dst) for r in _symmetric_delete_edges(cust).collect()}
    assert got == brute(cust) and got, "real-corpus edge sets must agree"

    # Adversarial lengths: insertion/deletion neighbors, duplicates,
    # a lev-2 decoy, and a cross-nation pair that must NOT match.
    synth = spark.createDataFrame(
        [
            (1, "abcd", 0), (2, "abc", 0),     # deletion pair
            (3, "abxcd", 0),                    # insertion vs 1
            (4, "abcd", 0),                     # exact duplicate of 1
            (5, "azcd", 0),                     # substitution vs 1
            (6, "zzzz", 0),                     # far away
            (7, "abcd", 1),                     # same name, other nation
            (8, "ab", 0),                       # lev 2 from "abcd"
        ],
        "c_custkey bigint, c_name string, c_nationkey int",
    )
    got_s = {(r.src, r.dst) for r in _symmetric_delete_edges(synth).collect()}
    assert got_s == brute(synth)
    assert (1, 2) in got_s and (1, 3) in got_s and (1, 4) in got_s
    assert (1, 5) in got_s and (2, 8) in got_s
    assert not any(7 in e for e in got_s) and not any(6 in e for e in got_s)


def test_cuped_theta_matches_numpy_and_reduces_spread(spark):
    """theta must equal an independent numpy computation from the same
    per-user integer sums, and the CUPED adjustment must not increase
    the between-variant spread's dependence on pre-period imbalance:
    adj_mean == mean_y - theta*(mean_x_v - mean_x) exactly."""
    import duckdb as _duck

    rows = {r.variant: r for r in _rows(spark, "cuped_ab_adjustment")}
    assert set(rows) == {0, 1}
    pu = _duck.sql(
        f"""
        SELECT user_id % 2 AS v,
               SUM(CASE WHEN day(ts) <= 15
                   THEN CAST(round(value*100) AS BIGINT) // 1000
                   ELSE 0 END) AS x,
               SUM(CASE WHEN day(ts) > 15
                   THEN CAST(round(value*100) AS BIGINT) // 1000
                   ELSE 0 END) AS y
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    xs = np.array([r[1] for r in pu], dtype=np.int64)
    ys = np.array([r[2] for r in pu], dtype=np.int64)
    vs = np.array([r[0] for r in pu], dtype=np.int64)
    n = len(xs)
    th = float(n * (xs * ys).sum() - xs.sum() * ys.sum()) / float(
        n * (xs * xs).sum() - xs.sum() ** 2
    )
    for v in (0, 1):
        m = vs == v
        mean_y = ys[m].sum() / m.sum()
        adj = mean_y - th * (xs[m].sum() / m.sum() - xs.sum() / n)
        assert rows[v].theta_q == int(np.floor(th * 1e6 + 0.5))
        assert abs(rows[v].adj_mean_q - int(np.floor(adj * 1000 + 0.5))) <= 1
        assert rows[v].n_users == int(m.sum())
