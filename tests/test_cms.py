"""Count-min sketch (operators/cms.py): upper-bound property,
mergeability, and determinism."""

import pytest
from pyspark.sql import functions as F

from det_module_spark.operators.cms import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
)


@pytest.fixture()
def skewed(spark):
    # value v appears v times, v in 1..40 (clear heavy tail)
    return spark.range(1, 41).select(
        F.explode(F.sequence(F.lit(1), F.col("id"))).alias("dummy"),
        F.col("id").alias("k"),
    ).select("k")


def test_estimate_never_undercounts(spark, skewed):
    sk = cms_sketch(skewed, "k", width=64, depth=4)
    est = {
        r["value"]: r["est_count"]
        for r in cms_estimate(sk, skewed, "k", width=64, depth=4).collect()
    }
    true = {
        r["k"]: r["cnt"]
        for r in skewed.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(est) == set(true)
    for v, t in true.items():
        assert est[v] >= t  # CM never under-counts
    # with 40 keys in 64x4 buckets most estimates are exact
    exact = sum(1 for v in true if est[v] == true[v])
    assert exact >= 30


def test_heavy_hitters_top_ranked(spark, skewed):
    top = cms_heavy_hitters(skewed, "k", width=64, depth=4, top=5).collect()
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    # CM guarantee: estimates only inflate, so the true heaviest key
    # can never be displaced below a key whose true count is smaller
    # AND whose estimate is exact — assert the heaviest key leads.
    # Collisions may pull light keys INTO the top list (false
    # positives are allowed by the sketch); self-consistency: the
    # reported top-5 is the argmax-5 of the full estimate map.
    assert top[0]["value"] == 40
    sk = cms_sketch(skewed, "k", width=64, depth=4)
    est = cms_estimate(sk, skewed, "k", width=64, depth=4).collect()
    best5 = sorted(est, key=lambda r: (-r["est_count"], r["value"]))[:5]
    assert [(r["value"], r["est_count"]) for r in best5] == [
        (r["value"], r["est_count"]) for r in top
    ]


def test_sketch_is_mergeable(spark, skewed):
    # sketch(A ∪ B) == sketch(A) + sketch(B) counter-wise
    a = skewed.filter(F.col("k") <= 20)
    b = skewed.filter(F.col("k") > 20)
    whole = {
        (r["hrow"], r["bucket"]): r["cnt"]
        for r in cms_sketch(skewed, "k", width=64, depth=4).collect()
    }
    pa = cms_sketch(a, "k", width=64, depth=4)
    pb = cms_sketch(b, "k", width=64, depth=4)
    merged = {}
    for r in pa.unionByName(pb).groupBy("hrow", "bucket").agg(
        F.sum("cnt").alias("cnt")
    ).collect():
        merged[(r["hrow"], r["bucket"])] = r["cnt"]
    assert merged == whole


def test_partitioning_independent(spark, skewed):
    one = cms_sketch(skewed, "k", width=32, depth=2).orderBy(
        "hrow", "bucket"
    ).collect()
    other = cms_sketch(skewed.repartition(13), "k", width=32, depth=2).orderBy(
        "hrow", "bucket"
    ).collect()
    assert one == other


def test_bloom_filter_never_drops_matches(spark):
    from det_module_spark.operators.bloom import bloom_build, bloom_filter_df

    keys = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # 143 keys
    fact = spark.range(5000).select(F.col("id").alias("fk"))
    passed = {r["fk"] for r in bloom_filter_df(fact, keys, "fk", "k").collect()}
    true_keys = set(range(0, 1000, 7))
    # containment: every true key below 5000 passes
    assert true_keys <= passed
    # pruning actually happened (false positives are a small minority)
    assert len(passed) < 1000
    # deterministic across partitionings
    passed2 = {
        r["fk"]
        for r in bloom_filter_df(
            fact.repartition(11), keys.repartition(5), "fk", "k"
        ).collect()
    }
    assert passed == passed2
    # bitmap is bounded: 4095 bits -> 65 words
    assert len(bloom_build(keys, "k")) == 65


def test_bloom_filter_negative_keys_and_nulls(spark):
    """ADVICE r02: negative keys must never be dropped (pmod keeps
    positions in [0, m) on both the Python build side and the SQL
    probe side), and NULL keys must not crash the build."""
    from pyspark.sql import Row

    from det_module_spark.operators.bloom import bloom_build, bloom_filter_df

    keys = spark.createDataFrame(
        [Row(k=-(2**30)), Row(k=-7), Row(k=None), Row(k=3), Row(k=2**30)],
        "k BIGINT",
    )
    fact = spark.createDataFrame(
        [Row(fk=v) for v in (-(2**30), -7, -6, 3, 2**30, 999, None)],
        "fk BIGINT",
    )
    words = bloom_build(keys, "k")  # NULL key: no crash, no bit
    assert all(w >= 0 for w in words)
    passed = {r["fk"] for r in bloom_filter_df(fact, keys, "fk", "k").collect()}
    assert {-(2**30), -7, 3, 2**30} <= passed  # containment incl. negatives
    assert None not in passed  # NULL never equi-joins


def test_bloom_filter_fact_side_no_shuffle(spark):
    import re

    from det_module_spark.operators.bloom import bloom_filter_df

    keys = spark.range(100).select(F.col("id").alias("k"))
    fact = spark.range(10000).select(F.col("id").alias("fk"))
    df = bloom_filter_df(fact, keys, "fk", "k")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # membership is a literal-array filter: no exchange, no join
    assert "Exchange" not in plan
    assert "Join" not in plan
