"""bucket_plan (r9-prep): cross-engine-exact bucketed-layout sizing —
the pure-plan sibling of write_bucketed_spill_aware. The DuckDB twin
must reproduce every output integer bit-for-bit."""

import duckdb
import pytest
from pyspark.sql import functions as F

from det_module_spark.operators.layout import bucket_plan, bucket_plan_sql


def _spark_row(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bucket_plan(
        docs, F.col("doc_id"), ["text", "lang", "source"],
        fixed_bytes=16, target_bucket_bytes=8192,
    ).collect()[0]


def _oracle_row(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = bucket_plan_sql(
        "documents", "doc_id", ["text", "lang", "source"],
        fixed_bytes=16, target_bucket_bytes=8192,
    )
    cols = ["n_rows", "est_total_bytes", "n_buckets",
            "max_bucket_rows", "skew_ppm"]
    return dict(zip(cols, con.execute(sql).fetchone()))


def test_bucket_plan_matches_duckdb_twin(spark, sf_dir):
    s = _spark_row(spark, sf_dir)
    o = _oracle_row(sf_dir)
    for k, v in o.items():
        assert s[k] == v, (k, s[k], v)


def test_bucket_count_is_next_power_of_two(spark, sf_dir):
    s = _spark_row(spark, sf_dir)
    nb, total = s["n_buckets"], s["est_total_bytes"]
    assert nb & (nb - 1) == 0
    assert nb * 8192 >= total
    assert nb == 1 or (nb // 2) * 8192 < total


def test_tiny_input_gets_one_bucket(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    r = bucket_plan(
        df, F.col("k"), ["s"], fixed_bytes=8,
        target_bucket_bytes=1 << 20,
    ).collect()[0]
    assert r["n_buckets"] == 1 and r["n_rows"] == 1
    assert r["est_total_bytes"] == 9
    assert r["skew_ppm"] == 1_000_000  # 1 row / 1 bucket = uniform


def test_null_varlen_counts_zero(spark):
    df = spark.createDataFrame([(1, None), (2, "xy")], "k long, s string")
    r = bucket_plan(
        df, F.col("k"), ["s"], fixed_bytes=8,
        target_bucket_bytes=1 << 20,
    ).collect()[0]
    assert r["est_total_bytes"] == 16 + 2
