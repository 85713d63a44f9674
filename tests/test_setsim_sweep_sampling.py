"""Tests for prefix-filter set-similarity join, sweep-line
concurrency, equi-depth histogram, and weighted A-ES sampling."""

from pyspark.sql import functions as F

from det_module_spark.operators.profile import equidepth_histogram
from det_module_spark.operators.sampling import weighted_hash_sample
from det_module_spark.operators.setsim import (
    jaccard_allpairs_bruteforce,
    jaccard_prefix_pairs,
)
from det_module_spark.operators.sweepline import concurrency_curve


def test_prefix_filter_is_lossless(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),      # high overlap with 1
        (3, "a b c d z y x w"),      # medium overlap
        (4, "p q r s t u v w"),      # disjoint-ish
        (5, "a b c d e f g h"),      # duplicate of 1
        (6, "m n"),                  # tiny set
        (7, "m n"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for t in (0.3, 0.5, 0.8):
        fast = sorted(
            map(tuple, jaccard_prefix_pairs(df, threshold=t, n=1).collect())
        )
        slow = sorted(
            map(
                tuple,
                jaccard_allpairs_bruteforce(df, threshold=t, n=1).collect(),
            )
        )
        assert fast == slow, f"threshold {t}"
    # duplicates found at every threshold
    assert any(
        p[0] == 1 and p[1] == 5
        for p in jaccard_prefix_pairs(df, threshold=0.9, n=1).collect()
    )


def test_prefix_filter_shingle_mode_matches_bruteforce(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "pack my box with five dozen liquor jugs now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fast = sorted(
        map(tuple, jaccard_prefix_pairs(df, threshold=0.4, n=3).collect())
    )
    slow = sorted(
        map(tuple, jaccard_allpairs_bruteforce(df, threshold=0.4, n=3).collect())
    )
    assert fast == slow
    assert len(fast) == 1  # docs 1-2 only


def test_concurrency_curve_basic(spark):
    # intervals on one group: [1,3], [2,5], [4,5] (end-exclusive)
    df = spark.createDataFrame(
        [("g", 1, 3), ("g", 2, 5), ("g", 4, 5)], "grp string, s int, e int"
    )
    got = {
        r["instant"]: (r["delta"], r["open_count"])
        for r in concurrency_curve(df, "grp", F.col("s"), F.col("e")).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 2)
    assert got[3] == (-1, 1)
    assert got[4] == (1, 2)
    assert got[5] == (-2, 0)


def test_concurrency_curve_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 2)], "grp string, s int, e int"
    )
    out = concurrency_curve(df, "grp", F.col("s"), F.col("e")).collect()
    assert all(r["open_count"] <= 1 for r in out)


def test_equidepth_histogram_even_split(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 9)], "v long, k long"
    )
    got = sorted(
        map(tuple, equidepth_histogram(df, "v", "k", 4).collect())
    )
    # 8 rows into 4 buckets of 2: [1,2][3,4][5,6][7,8]
    assert got == [
        (1, 2, 1, 2), (2, 2, 3, 4), (3, 2, 5, 6), (4, 2, 7, 8),
    ]


def test_weighted_sample_deterministic_and_weighted(spark):
    rows = [(i, 1 if i < 90 else 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w long")
    s1 = {r["id"] for r in weighted_hash_sample(df, F.col("w"), F.col("id"), 10).collect()}
    s2 = {r["id"] for r in weighted_hash_sample(df, F.col("w"), F.col("id"), 10).collect()}
    assert s1 == s2 and len(s1) == 10
    # the 10 heavy rows (w=1000, ids 90..99) should dominate the sample
    assert len([i for i in s1 if i >= 90]) >= 8
    # zero/negative weights are excluded
    dfz = spark.createDataFrame([(1, 0), (2, 5)], "id long, w long")
    got = weighted_hash_sample(dfz, F.col("w"), F.col("id"), 5).collect()
    assert [r["id"] for r in got] == [2]
