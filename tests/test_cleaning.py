"""Tests for group-mean imputation and z-score outlier flagging."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from det_module_spark.operators.cleaning import impute_group_mean, zscore_outliers


def test_impute_group_mean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", None), ("b", None)],
        "g string, v double",
    )
    out = impute_group_mean(df, "v", "g", out="filled").collect()
    a_vals = sorted(r.filled for r in out if r.g == "a")
    assert a_vals == [1.0, 2.0, 3.0]  # null filled with mean(1,3)=2
    assert all(r.filled is None for r in out if r.g == "b")  # all-null group


def test_zscore_outliers_flags_extreme(spark):
    # 10 values at 10, one at 1000: the spike must be the only outlier
    rows = [("a", 10)] * 10 + [("a", 1000)]
    df = spark.createDataFrame(rows, "g string, v long").withColumn(
        "id", F.monotonically_increasing_id()
    )
    out = zscore_outliers(df, "v", "g", threshold=2.5).collect()
    flagged = [r.v for r in out if r.is_outlier]
    assert flagged == [1000]
    # z of the spike: mean=100, var=(11*1009100-1100^2)/(11*10)=89910/0.9...
    mu = (10 * 10 + 1000) / 11
    sd = math.sqrt(sum((v - mu) ** 2 for _, v in rows) / 10)
    z_spike = next(r.zscore for r in out if r.v == 1000)
    assert math.isclose(z_spike, (1000 - mu) / sd, rel_tol=1e-9)


def test_zscore_small_or_constant_groups_null(spark):
    df = spark.createDataFrame(
        [("solo", 5), ("const", 7), ("const", 7)], "g string, v long"
    )
    out = zscore_outliers(df, "v", "g").collect()
    assert all(r.zscore is None and r.is_outlier is None for r in out)
