"""Parquet table catalog over a scale-factor directory.

The driver's testdata layout (TESTDATA.md): one parquet per table under
``/root/testdata/sf*/``. Parquet scans get predicate pushdown + column
pruning + partition pruning from Catalyst for free; at 100 TB the same
loader points at a partitioned table root instead of a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Accepts both ``<dir>/<name>.parquet`` (driver
    testdata) and ``<dir>/<name>/`` (partitioned production layout).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; it is read as raw nanos (legacy conf) and converted
    to a microsecond TimestampType column with integer arithmetic
    (``div`` — double division would lose precision above 2^53 ns).
    """
    single = os.path.join(sf_dir, f"{name}.parquet")
    root = os.path.join(sf_dir, name)
    path = single if os.path.exists(single) else root
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` sees the
    same names the DuckDB oracle does."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
