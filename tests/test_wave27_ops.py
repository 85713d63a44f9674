"""Units for the round-5 wave-27 operators: centroid drift, RBO."""

import math

from pyspark.sql import functions as F


def test_centroid_drift_identical_and_opposed(spark):
    from det_module_spark.operators.similarity import centroid_drift

    # label 'same': both splits share one direction -> cos = 1e6;
    # label 'flip': splits point opposite ways -> cos = -1e6
    rows = []
    for i in range(8):
        vec = [1.0, 2.0, -1.0, 0.5]
        rows.append(("same", i, vec))
        sign = 1.0 if i % 2 == 0 else -1.0
        rows.append(("flip", 100 + i, [sign * x for x in vec]))
    df = spark.createDataFrame(rows, ["label", "vec_id", "embedding"])
    got = {
        r["label"]: (r["n_a"], r["n_b"], r["cos_ppm"])
        for r in centroid_drift(
            df, "label", F.col("vec_id") % 2 == 0
        ).collect()
    }
    assert got["same"] == (4, 4, 1_000_000)
    assert got["flip"] == (4, 4, -1_000_000)


def test_centroid_drift_matches_reference(spark):
    from det_module_spark.operators.similarity import centroid_drift

    rows = [
        ("l", i, [((i * 7 + d) % 5 - 2) / 2.0 + 0.3 for d in range(6)])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["label", "vec_id", "embedding"])
    r = centroid_drift(df, "label", F.col("vec_id") % 2 == 0).collect()[0]
    sa = [0] * 6
    sb = [0] * 6
    for _l, i, vec in rows:
        tgt = sa if i % 2 == 0 else sb
        for d, v in enumerate(vec):
            tgt[d] += math.floor(v * 10000 + 0.5)
    dot = sum(a * b for a, b in zip(sa, sb))
    na2 = sum(a * a for a in sa)
    nb2 = sum(b * b for b in sb)
    expect = math.floor(
        1e6 * dot / (math.sqrt(na2) * math.sqrt(nb2)) + 0.5
    )
    assert r["cos_ppm"] == expect


def test_rbo_weights_sum_below_one_and_decay():
    import __spark_entry__ as m

    w = m._rbo_weights()
    assert [d for d, _ in w] == list(range(1, 11))
    vals = [x for _d, x in w]
    assert vals == sorted(vals, reverse=True)
    assert sum(vals) < 1_000_000_000  # truncated RBO_min mass < 1


def test_rbo_identical_rankings_hit_max(spark, sf_dir):
    """RBO of a ranking with itself = the full truncated mass."""
    import __spark_entry__ as m
    from pyspark.sql import Window

    wdf = spark.createDataFrame(m._rbo_weights(), ["d", "wq"])
    docs = spark.createDataFrame(
        [(i,) for i in range(10)], ["doc_id"]
    )
    ranked = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).alias("rnk"),
    )
    pref = ranked.select(
        "doc_id",
        F.explode(F.sequence(F.col("rnk"), F.lit(10))).alias("d"),
    )
    full = (
        pref.alias("a")
        .join(pref.alias("b"), ["doc_id", "d"])
        .join(F.broadcast(wdf), "d")
        .agg(F.sum("wq").alias("mass"))
        .collect()[0]["mass"]
    )
    # overlap@d of identical prefixes is d, so Σ d·w_d is the cap
    expect = sum(d * w for d, w in m._rbo_weights())
    assert full == expect


def test_lorenz_deciles_monotone_and_complete(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["lorenz_deciles"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    shares = [r["share_ppm"] for r in rows]
    # ranked ascending by spend: decile shares are non-decreasing
    assert shares == sorted(shares)
    assert 999_990 <= sum(shares) <= 1_000_000  # div truncation only
    total = sum(r["n_cust"] for r in rows)
    assert max(r["n_cust"] for r in rows) - min(
        r["n_cust"] for r in rows
    ) <= 1 or total >= 10


def test_funnel_ttc_nonnegative_days(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["funnel_ttc"](spark, sf_dir).collect()
    assert rows, "somebody converts in every SF"
    assert all(r["days"] >= 0 for r in rows)
