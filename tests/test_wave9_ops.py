"""Units for the round-5 wave-9 operators: bigram PMI, degree
assortativity, and exact Gini (dau_wau is a query-level composition
covered by the driver oracle)."""

import math

from pyspark.sql import functions as F


def test_bigram_pmi_reference_values(spark):
    from det_module_spark.operators.text import bigram_pmi

    # corpus: "a b" x 6, "a c" x 2 (as separate docs so bigrams don't
    # chain); marginals: c1(a)=8; c2(b)=6, c2(c)=2; N=8
    docs = [(i, "a b") for i in range(6)] + [(10 + i, "a c") for i in range(2)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["pmi_q"])
        for r in bigram_pmi(df, min_count=2).collect()
    }
    lnq = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    want_ab = lnq(6) + lnq(8) - lnq(8) - lnq(6)  # = 0: b always after a
    want_ac = lnq(2) + lnq(8) - lnq(8) - lnq(2)
    assert got == {("a", "b"): (6, want_ab), ("a", "c"): (2, want_ac)}
    assert want_ab == 0


def test_degree_assortativity_signs(spark):
    from det_module_spark.operators.graph import degree_assortativity

    # star graph: hub to 5 leaves -> perfectly disassortative (r = -1)
    star = [("h", f"l{i}") for i in range(5)]
    [r] = degree_assortativity(
        spark.createDataFrame(star, ["src", "dst"])
    ).collect()
    assert r["r_q"] == -1_000_000
    assert r["n_ends"] == 10  # 5 undirected edges, both orientations

    # two disjoint regular cliques (deg constant) -> no variance: NULL
    k3 = [("a", "b"), ("b", "c"), ("a", "c"),
          ("x", "y"), ("y", "z"), ("x", "z")]
    [r2] = degree_assortativity(
        spark.createDataFrame(k3, ["src", "dst"])
    ).collect()
    assert r2["r_q"] is None


def test_gini_exact_known_distributions(spark):
    from det_module_spark.operators.profile import gini_exact

    rows = (
        [("eq", 5)] * 4  # perfectly equal -> G = 0
        + [("one", 0), ("one", 0), ("one", 0), ("one", 100)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["grp"]: r["gini_ppm"] for r in gini_exact(df, "g", "v").collect()}
    assert got["eq"] == 0
    # one-holder of n=4: G = (n-1)/n = 0.75
    assert got["one"] == 750_000


def test_gini_tie_order_invariant(spark):
    from det_module_spark.operators.profile import gini_exact

    rows = [("g", v) for v in [3, 1, 3, 1, 3, 1]]
    df = spark.createDataFrame(rows, ["g", "v"])
    a = gini_exact(df, "g", "v").collect()[0]["gini_ppm"]
    b = gini_exact(
        df.repartition(5), "g", "v"
    ).collect()[0]["gini_ppm"]
    assert a == b
    # hand value: sorted 1,1,1,3,3,3; six=1+2+3+12+15+18=51; sx=12;
    # G = (2*51 - 7*12) / (6*12) = 18/72 = 0.25
    assert a == 250_000
