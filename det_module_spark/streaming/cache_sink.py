"""Streaming → content-addressed cache: foreachBatch commit.

Ties the streaming front-end to the engine's defining feature: extract
results computed incrementally land in the same content-addressed
cache the batch planner anti-joins against. ``foreachBatch`` gives
exactly the transactional seam needed — each micro-batch groups its
rows by spec hash and commits them through ``CacheManifest.put_many``
(artifact-then-manifest, so a crashed batch can't fake a hit; replays
of the same batch are idempotent upserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from det_module_spark.plans.cache import CacheManifest


def stream_to_cache(
    results: DataFrame,
    cache: CacheManifest,
    hash_col: str = "spec_hash",
    kind: str = "extract",
    checkpoint: str | None = None,
    query_name: str = "cache_sink",
):
    """Start a streaming query that commits each micro-batch's rows to
    the cache, grouped by spec hash. Returns the StreamingQuery."""

    def commit(batch: DataFrame, batch_id: int) -> None:
        # a NULL spec hash cannot address an artifact: result_path(None)
        # would TypeError inside os.path.join and kill the whole
        # streaming query (and its filter would be null-semantics
        # empty anyway) — drop such rows before grouping. The batch is
        # persisted because it fans out to 1 + |hashes| jobs (the
        # distinct collect plus one filtered write per hash); without
        # the cache each job re-computes the micro-batch source.
        batch = batch.filter(batch[hash_col].isNotNull()).persist()
        try:
            hashes = [
                r[0] for r in batch.select(hash_col).distinct().collect()
            ]
            entries = []
            for h in hashes:
                entries.append(
                    (
                        h,
                        kind,
                        batch.filter(batch[hash_col] == h).drop(hash_col),
                    )
                )
            cache.put_many(entries)
        finally:
            batch.unpersist()

    writer = (
        results.writeStream.foreachBatch(commit)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
