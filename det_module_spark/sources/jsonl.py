"""JSON-Lines corpus source/sink — the lingua franca of LLM training
data (one JSON document per line, gzip-friendly, append-only).

Reading ALWAYS takes an explicit schema: schema inference samples the
whole input (a full extra pass at 100 TB) and silently widens types on
dirty rows. Corrupt lines land in ``_corrupt_record`` under
PERMISSIVE mode instead of failing the job — a 100 TB crawl WILL
contain malformed lines, and dropping the batch for one bad row is the
wrong trade. The column is surfaced so pipelines can route bad rows to
a quarantine sink and count them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Documents + a ``_corrupt_record`` column (null for clean rows)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column;
    quarantine keeps the raw line for replay after a parser fix.

    Spark refuses to filter on ``_corrupt_record`` straight off the
    file scan (the parser would have to re-run with different required
    columns — SPARK-21610), so the parsed batch is persisted first;
    both output branches then read the same materialized parse, which
    is also what you want operationally (parse once, route twice)."""
    df = df.cache()
    corrupt = F.col("_corrupt_record").isNotNull()
    return (
        df.filter(~corrupt).drop("_corrupt_record"),
        df.filter(corrupt).select(F.col("_corrupt_record").alias("raw_line")),
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned JSONL output (one file per task — at scale a
    single-file contract would serialize the whole corpus through one
    writer; downstream consumers glob the directory)."""
    df.write.mode(mode).json(path)
