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


# Resolved-DataFrame memo: schema inference reads parquet footers on
# every ``spark.read.parquet`` (~100ms each); a workload that builds
# many queries over the same tables pays that once per (session, dir,
# table) instead of once per query. This caches METADATA (the resolved
# logical plan), not data — exactly what a table catalog does; scans
# still stream from disk and pick up nothing stale because the
# testdata directories are immutable inputs.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Accepts both ``<dir>/<name>.parquet`` (driver
    testdata) and ``<dir>/<name>/`` (partitioned production layout).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; it is read as raw nanos (legacy conf) and converted
    to a microsecond TimestampType column with integer arithmetic
    (``div`` — double division would lose precision above 2^53 ns).
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _ts_unit(path: str) -> str | None:
    """Footer-only probe of the events ``ts`` column's timestamp unit
    ('ns'/'us'/'ms'), via one pyarrow schema read of one shard —
    bounded I/O, no Spark job."""
    import glob

    f = path
    if os.path.isdir(path):
        shards = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not shards:
            return None
        f = shards[0]
    try:
        import pyarrow.parquet as pq

        return getattr(pq.read_schema(f).field("ts").type, "unit", None)
    except Exception:
        return None


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    single = os.path.join(sf_dir, f"{name}.parquet")
    root = os.path.join(sf_dir, name)
    path = single if os.path.exists(single) else root
    if name == "events":
        # TIMESTAMP(NANOS) parquet needs the legacy nanosAsLong conf —
        # which is SESSION-WIDE and consulted again at task execution,
        # so a set/restore around the (lazy) read would break it.
        # Scope the blast radius instead: probe the footer and set the
        # conf only when the file really carries nanos; micros/millis
        # files read plainly and the session conf is never touched
        # (setting it unconditionally silently retyped every later
        # TIMESTAMP(NANOS) read in the caller's session as bigint).
        if _ts_unit(path) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            from pyspark.sql import functions as F

            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            return df
        return spark.read.parquet(path)
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet layout: queries filtering on the partition
    columns prune whole directories (verified via PartitionFilters in
    the scan node). The 100 TB default for fact tables — partition by
    low-cardinality time/dataset keys, never by high-cardinality ids."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table: pre-shuffles data by join key at write time so
    later joins/aggregations on that key are exchange-free (both sides
    bucketed by the same key and count -> zero-shuffle sort-merge
    join). This is the 'pay the shuffle once' strategy for fact-fact
    joins repeated across a workload."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` sees the
    same names the DuckDB oracle does."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
