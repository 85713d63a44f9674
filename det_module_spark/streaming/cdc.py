"""Streaming CDC: apply a change stream to a materialized snapshot.

The streaming face of ``operators/scd.cdc_apply``: each micro-batch of
I/U/D changes is folded into a parquet snapshot via ``foreachBatch``.
Correctness leans on two properties, both tested:

- ``cdc_apply`` is last-writer-wins by an explicit ``seq`` order and
  **idempotent** (tests/test_properties.py), so at-least-once batch
  delivery (foreachBatch replays after failure) cannot corrupt the
  snapshot;
- the snapshot swap is write-temp-then-rename, so readers never see a
  half-applied batch (same protocol as sources/maintenance).

At 100 TB the snapshot would be a Delta/Iceberg table and this becomes
``MERGE INTO`` per batch; the logical plan (window latest-per-key +
outer join) is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from det_module_spark.operators.scd import cdc_apply


def apply_batch_to_snapshot(
    spark: SparkSession,
    snapshot_path: str,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    seq: str = "seq",
    op: str = "op",
) -> None:
    """Fold one change batch into the parquet snapshot at
    ``snapshot_path`` (atomic swap)."""
    snap = spark.read.parquet(snapshot_path)
    updated = cdc_apply(snap, changes, key, value_cols, seq=seq, op=op)
    tmp = f"{snapshot_path}.__cdc_{uuid.uuid4().hex[:8]}"
    updated.write.mode("overwrite").parquet(tmp)
    old = f"{snapshot_path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(snapshot_path, old)
    os.rename(tmp, snapshot_path)
    shutil.rmtree(old)


def stream_cdc_to_snapshot(
    changes: DataFrame,
    snapshot_path: str,
    key: str,
    value_cols: list[str],
    seq: str = "seq",
    op: str = "op",
    checkpoint: str | None = None,
    query_name: str = "cdc_sink",
):
    """Start a streaming query folding each micro-batch of changes into
    the snapshot. Returns the StreamingQuery (availableNow trigger, so
    it drains queued input then stops — cron-compatible like the
    reference's polling loop)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_batch_to_snapshot(
            batch.sparkSession,
            snapshot_path,
            batch,
            key,
            value_cols,
            seq=seq,
            op=op,
        )

    writer = (
        changes.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
