"""Content-addressed result cache + incremental evaluation (E2).

This is the reference's single most important performance feature
(SURVEY.md §4): results are memoized under the SHA-1 of the normalized
item spec, shared across requests and users (common-subexpression
elimination at the workload level). The reference probes Mongo + the
filesystem per item (queue/extract_check.py:62-110,
queue/msr_check.py:22-53); here the manifest is a parquet table and the
probe is ONE ``left_anti`` join for the whole item plan — constant
number of jobs regardless of item count.

States mirror the reference's work-item machine
(queue/extract_check.py:113-143): an item counts as *cached* only when
status == DONE **and** its artifact is committed — a done row without a
committed artifact is missing (extract_check.py:132-136). Artifact
commit is represented by the ``committed`` flag written only after the
result parquet is fully written (the ``_SUCCESS``-marker pattern),
so a crashed writer never yields a phantom cache hit.

At 100 TB the manifest stays tiny (one row per item ever computed) and
is always the broadcast side of the anti-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_QUEUED = 0
STATUS_DONE = 1
STATUS_PROCESSING = 2
STATUS_ERROR = -1

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("spec_hash", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("committed", T.BooleanType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("update_time", T.LongType(), True),
    ]
)


class CacheManifest:
    """Parquet-backed manifest keyed by spec hash."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest_path = os.path.join(root, "_manifest")

    def read(self) -> DataFrame:
        if not os.path.exists(self.manifest_path):
            return self.spark.createDataFrame([], schema=MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.manifest_path)

    def cached_hashes(self) -> DataFrame:
        m = self.read()
        return m.filter(
            (F.col("status") == STATUS_DONE) & F.col("committed")
        ).select("spec_hash")

    def missing(self, items: DataFrame) -> DataFrame:
        """Items that must run: requested − cached, as a left-anti join
        against the (broadcast) manifest."""
        return items.join(
            F.broadcast(self.cached_hashes()), "spec_hash", "left_anti"
        )

    def completed(self, items: DataFrame) -> DataFrame:
        """Items whose results are ready to merge."""
        return items.join(F.broadcast(self.cached_hashes()), "spec_hash", "inner")

    def result_path(self, spec_hash: str) -> str:
        return os.path.join(self.root, "results", spec_hash)

    def put(self, spec_hash: str, kind: str, df: DataFrame) -> str:
        """Write one result + commit its manifest row. See put_many."""
        return self.put_many([(spec_hash, kind, df)])[0]

    def put_many(
        self, entries: list[tuple[str, str, DataFrame]]
    ) -> list[str]:
        """Write results, then commit ALL manifest rows in one upsert
        (the reference's idempotent enqueue, extract_check.py:165-183,
        batched). Results are written before the manifest commit, so a
        crash mid-batch leaves at worst uncommitted artifacts — never
        a phantom cache hit. One manifest rewrite per batch instead of
        per item; on Delta the same operation is a single MERGE INTO."""
        if not entries:
            return []
        paths = []
        rows = []
        for spec_hash, kind, df in entries:
            path = self.result_path(spec_hash)
            df.write.mode("overwrite").parquet(path)
            paths.append(path)
            rows.append((spec_hash, kind, STATUS_DONE, True, path, 0))
        new = self.spark.createDataFrame(rows, schema=MANIFEST_SCHEMA)
        hashes = {e[0] for e in entries}
        merged = (
            self.read().filter(~F.col("spec_hash").isin(list(hashes)))
            .unionByName(new)
        )
        # tiny table: rewrite-in-place is safe and atomic-enough locally;
        # production target is Delta MERGE INTO.
        tmp = self.manifest_path + "._tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = self.spark.read.schema(MANIFEST_SCHEMA).parquet(tmp)
        final.coalesce(1).write.mode("overwrite").parquet(self.manifest_path)
        return paths

    def get(self, spec_hash: str) -> DataFrame:
        return self.spark.read.parquet(self.result_path(spec_hash))
