"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained incremental writes leave thousands of
small files per partition; at 100 TB that turns every scan into a
metadata storm (one task + one open per tiny file). Compaction rewrites
a parquet directory into ~``target_rows_per_file`` files, preserving
data exactly.

The rewrite goes through a temp directory + atomic-ish swap (rename)
so a crashed compaction never leaves the table half-rewritten: readers
see either the old layout or the new one.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(n_rows / target_rows_per_file)`` files. Returns the new file
    count. Row-count based (not byte based) because the caller knows
    its row width; at cluster scale prefer
    ``spark.sql.files.maxRecordsPerFile`` + repartition to the same
    effect.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)
