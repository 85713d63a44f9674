"""Units for the round-5 wave-19 operators: clustering coefficients,
Apriori 3-itemsets, layout-pruning eval, hex binning."""

import itertools
import math

from pyspark.sql import functions as F


def test_clustering_coefficients_on_known_graph(spark):
    from det_module_spark.operators.graph import clustering_coefficients

    # K4 on {a,b,c,d} plus a pendant e--a: cc(K4 members w/o e) = 1,
    # cc(a) = 3 triangles / C(4,2)=6 pairs -> 500000 ppm
    k4 = list(itertools.combinations("abcd", 2))
    edges = spark.createDataFrame(
        k4 + [("a", "e")], ["id_a", "id_b"]
    )
    got = {
        r["vertex"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
        for r in clustering_coefficients(edges).collect()
    }
    assert got["b"] == (3, 3, 1_000_000)
    assert got["c"] == (3, 3, 1_000_000)
    assert got["d"] == (3, 3, 1_000_000)
    assert got["a"] == (4, 3, 500_000)
    assert "e" not in got  # degree 1: undefined, excluded


def _ref_triples(baskets, min_support):
    sets = {}
    for b, i in baskets:
        sets.setdefault(b, set()).add(i)
    from collections import Counter

    cnt = Counter()
    for items in sets.values():
        for tri in itertools.combinations(sorted(items), 3):
            cnt[tri] += 1
    return {t: c for t, c in cnt.items() if c >= min_support}


def test_triple_counts_match_brute_force(spark):
    from det_module_spark.operators.basket import triple_counts

    baskets = [
        (b, "i%d" % ((b * k + k * k) % 7))
        for b in range(25)
        for k in range(5)
    ]
    df = spark.createDataFrame(baskets, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_count"]
        for r in triple_counts(df, "basket", "item", min_support=3)
        .collect()
    }
    assert got == _ref_triples(baskets, 3)


def test_layout_pruning_hilbert_beats_linear(spark):
    from det_module_spark.operators.layout import (
        hilbert_by,
        layout_pruning_eval,
    )

    pts = spark.range(0, 2000).select(
        F.col("id"),
        ((F.col("id") * 37) % 128).alias("x"),
        ((F.col("id") * 61) % 128).alias("y"),
    )
    probes = [(0, 31, 0, 31), (96, 127, 0, 31)]
    hil = hilbert_by(pts, "x", "y", bits=7).select(
        "x", "y",
        (F.col("hkey") * 100000 + F.col("id")).alias("okey"),
    )
    lin = pts.select(
        "x", "y", (F.col("x") * 100000 + F.col("id")).alias("okey")
    )
    t_h = sum(
        r["n_touched"]
        for r in layout_pruning_eval(hil, "okey", "x", "y", 16, probes)
        .collect()
    )
    t_l = sum(
        r["n_touched"]
        for r in layout_pruning_eval(lin, "okey", "x", "y", 16, probes)
        .collect()
    )
    assert t_h < t_l  # the reason hilbert_by exists


def _hex_ref(x, y, size):
    qf = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    sf = -qf - rf
    rx, rz, ry = (
        math.floor(qf + 0.5),
        math.floor(rf + 0.5),
        math.floor(sf + 0.5),
    )
    dx, dy, dz = abs(rx - qf), abs(ry - sf), abs(rz - rf)
    if dx > dy and dx > dz:
        return (-ry - rz, rz)
    if dy > dz:
        return (rx, rz)
    return (rx, -rx - ry)


def test_hex_bin_matches_reference_and_is_valid_cube(spark):
    from det_module_spark.operators.spatial import hex_bin

    rows = [(i, float((i * 13) % 97), float((i * 29) % 89)) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = {
        r["id"]: (r["hq"], r["hr"])
        for r in hex_bin(df, "x", "y", size=4.0).collect()
    }
    for i, x, y in rows:
        assert got[i] == _hex_ref(x, y, 4.0), (i, x, y)
