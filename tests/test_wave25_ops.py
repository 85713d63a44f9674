"""Units for the round-5 wave-25 operators: log-rank test, NDCG."""

import math

from pyspark.sql import functions as F


def _logrank_ref(units, a_label, horizon=3):
    """Pure-python mirror of survival.logrank_test's quantization."""
    mx = max(last for _c, _f, last in units)
    lt = [
        (c == a_label, last - f, 1 if last + horizon <= mx else 0)
        for c, f, last in units
    ]
    times = sorted({t for _ia, t, _d in lt})
    o_a = e_q = v_q = 0
    for t in times:
        n = sum(1 for _ia, u, _d in lt if u >= t)
        na = sum(1 for ia, u, _d in lt if ia and u >= t)
        d = sum(dd for _ia, u, dd in lt if u == t)
        da = sum(dd for ia, u, dd in lt if ia and u == t)
        if d == 0 or n <= 1:
            continue
        o_a += da
        e_q += math.floor(d * na / n * 1e6 + 0.5)
        v_q += math.floor(
            d * (na / n) * ((n - na) / n) * ((n - d) / (n - 1)) * 1e6
            + 0.5
        )
    d1 = o_a * 1_000_000 - e_q
    chi2 = (
        math.floor(d1 * d1 * 1000.0 / (1e6 * v_q) + 0.5)
        if v_q > 0
        else None
    )
    return o_a, e_q, v_q, chi2


def test_logrank_matches_reference_and_separates(spark):
    from det_module_spark.operators.survival import logrank_test

    # cohort A churns early, cohort B holds on; shared censoring edge
    units = (
        [("A", 0, 2 + (i % 3)) for i in range(12)]
        + [("B", 0, 9 + (i % 3)) for i in range(12)]
        + [("A", 0, 12), ("B", 0, 12)]
    )
    rows = []
    for i, (c, f, last) in enumerate(units):
        rows += [(c, i, f), (c, i, last)]
    df = spark.createDataFrame(rows, ["c", "u", "d"])
    r = logrank_test(
        df, F.col("c"), "u", F.col("d"), "A", "B", horizon_days=3
    ).collect()[0]
    o_a, e_q, v_q, chi2 = _logrank_ref(units, "A")
    assert (
        r["o_a"], r["e_a_micro"], r["v_micro"], r["chi2_milli"]
    ) == (o_a, e_q, v_q, chi2)
    assert r["chi2_milli"] > 3840  # far beyond the 0.05 cutoff


def test_logrank_null_when_identical_cohorts(spark):
    from det_module_spark.operators.survival import logrank_test

    units = [("A", 0, 3 + (i % 5)) for i in range(10)] + [
        ("B", 0, 3 + (i % 5)) for i in range(10)
    ] + [("A", 0, 20), ("B", 0, 20)]
    rows = []
    for i, (c, f, last) in enumerate(units):
        rows += [(c, i, f), (c, i, last)]
    df = spark.createDataFrame(rows, ["c", "u", "d"])
    r = logrank_test(
        df, F.col("c"), "u", F.col("d"), "A", "B", horizon_days=3
    ).collect()[0]
    assert r["chi2_milli"] is not None and r["chi2_milli"] < 100


def test_ndcg_weights_and_bounds(spark, sf_dir):
    import __spark_entry__ as m

    w = m._ndcg_weights()
    assert w[0] == (1, 1_000_000_000)  # 1/log2(2) = 1
    assert [x for _r, x in w] == sorted(
        (x for _r, x in w), reverse=True
    )
    rows = m.queries()["ndcg_eval"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert r["dcg_q"] <= r["idcg_q"]
