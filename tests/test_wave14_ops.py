"""Units for the round-5 wave-14 operators: weighted random walks
(session_metrics is a query-level composition covered by the driver
oracle and the sessionize tests)."""

import pytest
from pyspark.sql import functions as F


def test_weighted_walks_follow_edges_and_replay(spark):
    from det_module_spark.operators.graph import weighted_random_walks

    edges = [
        ("a", "b", 1),
        ("a", "c", 99),
        ("b", "a", 1),
        ("c", "a", 1),
    ]
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    out1 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in weighted_random_walks(e, seeds, steps=3).collect()
    )
    out2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in weighted_random_walks(e, seeds, steps=3).collect()
    )
    assert out1 == out2
    adj = {(u, v) for u, v, _ in edges}
    path = {s: n for _, s, n in out1}
    assert path[0] == "a" and len(path) == 4
    for s in range(1, 4):
        assert (path[s - 1], path[s]) in adj


def test_weighted_walks_bias_toward_heavy_edges(spark):
    from det_module_spark.operators.graph import weighted_random_walks

    # hub with one dominant edge (weight 999 of 1000 total): across
    # many independent walks, nearly all first hops take it
    edges = [("h", "x", 999), ("h", "y", 1)] + [
        (f"s{i}", "h", 1) for i in range(30)
    ]
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame(
        [(f"s{i}",) for i in range(30)], ["node"]
    )
    hops = [
        r["node"]
        for r in weighted_random_walks(e, seeds, steps=2)
        .where(F.col("step") == 2)
        .collect()
    ]
    assert len(hops) == 30
    assert hops.count("x") >= 25  # ~999/1000 expected


def test_weighted_walks_reject_nonpositive(spark):
    from det_module_spark.operators.graph import weighted_random_walks

    e = spark.createDataFrame([("a", "b", 0)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(ValueError, match="positive"):
        weighted_random_walks(e, seeds, steps=1)
