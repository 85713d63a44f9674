"""Tests for triangle counting, column entropy, profile drift, and
seasonal-baseline anomaly detection."""

import math

from pyspark.sql import functions as F

from det_module_spark.operators.anomaly import seasonal_anomalies
from det_module_spark.operators.graph import (
    triangle_count_per_vertex,
    triangle_listing,
)
from det_module_spark.operators.profile import column_entropy, profile_diff


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def test_triangle_listing_k4(spark):
    # complete graph on 4 vertices has exactly 4 triangles
    k4 = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")],
    )
    tris = sorted(map(tuple, triangle_listing(k4).collect()))
    assert tris == [
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d"),
    ]
    per_v = {
        r["vertex"]: r["n_triangles"]
        for r in triangle_count_per_vertex(k4).collect()
    }
    assert per_v == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_listing_square_no_diagonal(spark):
    sq = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert triangle_listing(sq).count() == 0


def test_triangle_direction_and_dups_ignored(spark):
    # reversed/duplicate edges and self-loops must not change the count
    g = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "c"), ("c", "c")],
    )
    assert triangle_listing(g).count() == 1


def test_column_entropy_uniform_and_constant(spark):
    df = spark.createDataFrame(
        [("x", "k"), ("y", "k"), ("x", "k"), ("y", "k")],
        "u string, c string",
    )
    got = {r["column"]: r for r in column_entropy(df, ["u", "c"]).collect()}
    assert got["c"]["entropy"] == 0.0
    assert got["c"]["n_distinct"] == 1
    # uniform over 2 values -> ln 2
    assert abs(got["u"]["entropy"] - math.log(2)) < 1e-6
    assert got["u"]["n"] == 4


def test_column_entropy_counts_nulls_as_category(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "v string")
    got = column_entropy(df, ["v"]).collect()[0]
    assert abs(got["entropy"] - math.log(2)) < 1e-6


def test_profile_diff_flags_changes(spark):
    before = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "k long, s string"
    )
    after = spark.createDataFrame(
        [(5, "x"), (6, "x")], "k long, s string"
    )
    got = {r["column"]: r for r in profile_diff(before, after).collect()}
    assert got["k"]["n_rows_before"] == 3 and got["k"]["n_rows_after"] == 2
    assert got["s"]["n_nulls_before"] == 1 and got["s"]["n_nulls_after"] == 0
    assert got["s"]["distinct_delta"] == -1
    assert got["k"]["min_changed"] and got["k"]["max_changed"]
    assert not got["s"]["min_changed"]


def test_seasonal_anomalies_flags_spike(spark):
    rows = []
    # 4 training days: type 'a', hour 00, bucket sum 10.0 +/- 1
    for d, v in zip(range(1, 5), [9.0, 10.0, 11.0, 10.0]):
        rows.append((f"2024-01-0{d} 00:30:00", "a", v))
    # observation day: massive spike at hour 00, normal at hour 01
    rows.append(("2024-01-09 00:15:00", "a", 100.0))
    rows.append(("2024-01-09 01:15:00", "a", 10.0))
    df = spark.createDataFrame(
        rows, "ts_s string, event_type string, value double"
    ).select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )
    got = {
        (r["day"], r["hour"]): r
        for r in seasonal_anomalies(df, "2024-01-05").collect()
    }
    spike = got[("2024-01-09", 0)]
    assert spike["is_anomaly"] is True
    assert spike["base_mean"] == 100000.0  # 10.0 in 1e-4 fixed point
    # hour 01 has no training data -> null z, null anomaly flag
    fresh = got[("2024-01-09", 1)]
    assert fresh["z"] is None and fresh["is_anomaly"] is None


def test_seasonal_anomalies_zero_variance_guard(spark):
    rows = [(f"2024-01-0{d} 00:30:00", "a", 5.0) for d in range(1, 5)]
    rows.append(("2024-01-09 00:15:00", "a", 5.0))
    df = spark.createDataFrame(
        rows, "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    got = seasonal_anomalies(df, "2024-01-05").collect()[0]
    assert got["z"] is None and got["is_anomaly"] is None


def test_triangle_family_randomized_vs_bruteforce(spark):
    # Erdős–Rényi G(n, p) equivalence sweep: the degree-oriented
    # two-join listing, the explode-based per-vertex counts, and the
    # shared-symmetrization clustering coefficients must all agree
    # with a driver-side brute force on the same random graph.
    # Deterministic seed — reproducible across runs and parallelisms.
    import itertools
    import random

    rng = random.Random(0xC0FFEE)
    for n, p in ((12, 0.35), (20, 0.2), (9, 0.7)):
        verts = [f"v{i:02d}" for i in range(n)]
        edges = [
            (a, b)
            for a, b in itertools.combinations(verts, 2)
            if rng.random() < p
        ]
        if not edges:
            continue
        # scramble directions + inject dups/self-loops (must be inert)
        listed = [
            (b, a) if rng.random() < 0.5 else (a, b) for a, b in edges
        ] + [edges[0], (verts[0], verts[0])]
        df = spark.createDataFrame(listed, "id_a string, id_b string")

        adj = {v: set() for v in verts}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want_tris = sorted(
            (a, b, c)
            for a, b, c in itertools.combinations(verts, 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )

        from det_module_spark.operators.graph import (
            clustering_coefficients,
            triangle_count_per_vertex,
            triangle_listing,
        )

        got_tris = sorted(map(tuple, triangle_listing(df).collect()))
        assert got_tris == want_tris, f"listing mismatch at n={n} p={p}"

        want_per_v: dict[str, int] = {}
        for t in want_tris:
            for v in t:
                want_per_v[v] = want_per_v.get(v, 0) + 1
        got_per_v = {
            r["vertex"]: r["n_triangles"]
            for r in triangle_count_per_vertex(df).collect()
        }
        assert got_per_v == want_per_v, f"corner counts at n={n} p={p}"

        got_cc = {
            r["vertex"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
            for r in clustering_coefficients(df).collect()
        }
        want_cc = {
            v: (
                len(adj[v]),
                want_per_v.get(v, 0),
                want_per_v.get(v, 0) * 2_000_000
                // (len(adj[v]) * (len(adj[v]) - 1)),
            )
            for v in verts
            if len(adj[v]) >= 2
        }
        assert got_cc == want_cc, f"clustering coeff at n={n} p={p}"
