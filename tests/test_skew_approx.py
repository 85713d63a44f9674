"""Salted aggregation correctness under skew; sketch-variant accuracy."""

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from det_module_spark.operators.extract_types import zonal_extract
from det_module_spark.operators.skew import (
    AlgebraicAgg,
    salted_agg,
    salted_count,
    salted_mean,
    salted_sum,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows — the pathological shape
    rng = random.Random(7)
    rows = [
        Row(k="hot" if i % 10 else f"cold_{i}", v=float(rng.randrange(100)))
        for i in range(5000)
    ]
    return spark.createDataFrame(rows)


def test_salted_matches_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
        .collect()
    }
    s = {r["k"]: r["sum_v"] for r in salted_sum(skewed, "k", "v").collect()}
    c = {r["k"]: r["n_rows"] for r in salted_count(skewed, "k").collect()}
    m = {r["k"]: r["mean_v"] for r in salted_mean(skewed, "k", "v").collect()}
    assert len(s) == len(plain)
    for k, (ps, pn) in plain.items():
        assert s[k] == ps
        assert c[k] == pn
        assert math.isclose(m[k], ps / pn)


def test_salted_min_max_merge(skewed):
    out = salted_agg(
        skewed,
        "k",
        [
            AlgebraicAgg("vmin", F.min("v"), F.min("_p_vmin")),
            AlgebraicAgg("vmax", F.max("v"), F.max("_p_vmax")),
        ],
        n_salts=8,
    )
    got = {r["k"]: (r["vmin"], r["vmax"]) for r in out.collect()}
    plain = {
        r["k"]: (r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == plain


def test_approx_variants_close_to_exact(spark):
    rng = random.Random(11)
    cells = spark.createDataFrame(
        [Row(asdf_id=i % 4, value=float(rng.randrange(2000))) for i in range(8000)]
    )
    exact_u = {
        r["asdf_id"]: r["exfield_0"]
        for r in zonal_extract(cells, "unique").collect()
    }
    approx_u = {
        r["asdf_id"]: r["exfield_0"]
        for r in zonal_extract(cells, "approx_unique").collect()
    }
    for k in exact_u:
        assert abs(approx_u[k] - exact_u[k]) / exact_u[k] < 0.1

    exact_m = {
        r["asdf_id"]: r["exfield_0"]
        for r in zonal_extract(cells, "median").collect()
    }
    approx_m = {
        r["asdf_id"]: r["exfield_0"]
        for r in zonal_extract(cells, "approx_median").collect()
    }
    for k in exact_m:
        assert abs(approx_m[k] - exact_m[k]) <= 20  # ~1% of the value range


def test_approx_stats_query_error_bounds(spark, sf_dir):
    """q_approx_stats (HLL distinct + approx quantiles on lineitem):
    sketch estimates must land within published error bounds of the
    exact values computed on the same data."""
    import __spark_entry__ as mod

    row = mod.q_approx_stats(spark, sf_dir).collect()[0]
    li = mod.load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.count_distinct("l_partkey").alias("nd_p"),
        F.count_distinct("l_suppkey").alias("nd_s"),
        F.expr("percentile(l_quantity, array(0.5, 0.95, 0.99))").alias("q"),
    ).collect()[0]
    # HLL++ default rsd is 5%; assert a 2x cushion
    assert abs(row.nd_partkey - exact.nd_p) / exact.nd_p < 0.10
    assert abs(row.nd_suppkey - exact.nd_s) / exact.nd_s < 0.10
    # percentile_approx at accuracy 1e6 is rank-exact (mod the GK
    # merge's sub-1 slack) below 1M rows; keep a tolerance so the test
    # survives re-tuning to sketch-sized accuracy
    got_q = (row.qty_p50, row.qty_p95, row.qty_p99)
    for got, want in zip(got_q, exact.q):
        assert abs(got - want) / want < 0.05
