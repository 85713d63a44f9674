"""Units for the round-5 wave-15 operators: graph-Voronoi nearest-seed
assignment (growth_accounting is a query-level composition covered by
the driver oracle)."""

from pyspark.sql import functions as F


def test_nearest_seed_min_hops_and_tiebreak(spark):
    from det_module_spark.operators.graph import nearest_seed

    # a--x--b, a--y; seeds a and b: x is 1 hop from both -> seed 'a'
    # wins the tie; y belongs to a at 1 hop; z unreachable
    edges = [
        ("a", "x"), ("x", "a"),
        ("b", "x"), ("x", "b"),
        ("a", "y"), ("y", "a"),
        ("z", "z2"),
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    got = {
        r["node"]: (r["hops"], r["seed"])
        for r in nearest_seed(e, seeds, rounds=4).collect()
    }
    assert got["a"] == (0, "a")
    assert got["b"] == (0, "b")
    assert got["x"] == (1, "a")  # tie broken toward seed 'a'
    assert got["y"] == (1, "a")
    assert "z" not in got and "z2" not in got


def test_nearest_seed_prefers_closer_seed(spark):
    from det_module_spark.operators.graph import nearest_seed

    # chain z - m - b (seed); a (seed) 3 hops from m via chain
    edges = [
        ("a", "p"), ("p", "q"), ("q", "m"),
        ("b", "m"),
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    got = {
        r["node"]: (r["hops"], r["seed"])
        for r in nearest_seed(e, seeds, rounds=4).collect()
    }
    assert got["m"] == (1, "b")  # b at 1 hop beats a at 3
    assert got["p"] == (1, "a")
    assert got["q"] == (2, "a")
