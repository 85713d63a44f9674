"""Spill-aware bucketed sink (round-8 growth item): bucket count sized
from measured data volume, skew surfaced at write time, bucketed-join
shuffle-freedom preserved."""

import warnings

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from det_module_spark.sources.tables import write_bucketed_spill_aware


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_count_scales_with_volume(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("x" * 96), F.col("id").cast("string")).alias("pad"),
    )
    try:
        # ~100 B/row * 10k rows ~= 1 MB; 64 KiB buckets -> 16 buckets
        rep = write_bucketed_spill_aware(
            df, "bsa_vol", "k", target_bucket_bytes=64 * 1024
        )
        assert rep["n_rows"] == 10_000
        assert rep["est_row_bytes"] > 96
        assert rep["n_buckets"] >= 16
        assert rep["n_buckets"] & (rep["n_buckets"] - 1) == 0  # pow2
        assert spark.table("bsa_vol").count() == 10_000
        # tiny input at a huge target -> 1 bucket
        rep2 = write_bucketed_spill_aware(
            df.limit(10), "bsa_tiny", "k",
            target_bucket_bytes=256 * 1024 * 1024,
        )
        assert rep2["n_buckets"] == 1
    finally:
        _drop(spark, "bsa_vol", "bsa_tiny")


def test_skew_warning_fires_on_hot_key(spark):
    hot = spark.createDataFrame(
        [Row(k=0 if i % 10 else i, v=i) for i in range(2000)]
    )
    # k=0 holds ~90% of rows -> one hot bucket at any count
    try:
        with pytest.warns(UserWarning, match="skewed"):
            rep = write_bucketed_spill_aware(
                hot, "bsa_skew", "k",
                target_bucket_bytes=4 * 1024, skew_warn_ratio=4.0,
            )
        assert rep["skew_ratio"] > 4.0
    finally:
        _drop(spark, "bsa_skew")


def test_uniform_key_does_not_warn(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            rep = write_bucketed_spill_aware(
                df, "bsa_uni", "k", target_bucket_bytes=2 * 1024
            )
        assert rep["skew_ratio"] < 2.0
    finally:
        _drop(spark, "bsa_uni")


def test_spill_aware_join_stays_shuffle_free(spark):
    a = spark.createDataFrame([Row(k=i % 50, v=float(i)) for i in range(1000)])
    b = spark.createDataFrame([Row(k=i % 50, w=float(i * 2)) for i in range(1000)])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # identical data volumes -> identical bucket counts
        write_bucketed_spill_aware(a, "bsa_a", "k", target_bucket_bytes=2048, sort_by="k")
        write_bucketed_spill_aware(b, "bsa_b", "k", target_bucket_bytes=2048, sort_by="k")
        joined = spark.table("bsa_a").join(spark.table("bsa_b"), "k")
        explained = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in explained
        assert "Exchange hashpartitioning" not in explained
        assert joined.count() == 1000 * 20
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        _drop(spark, "bsa_a", "bsa_b")
