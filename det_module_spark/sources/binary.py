"""Raw media-file ingestion via Spark's ``binaryFile`` source.

The ingestion front door for multimodal corpora: directories of
image/audio/video files become rows of (path, length, content) and are
normalized into the engine's media schema
(operators/multimodal.MEDIA_SCHEMA). At 100 TB the source parallelizes
by file (one task per split of the file listing); tiny-file overhead is
then fixed by writing the normalized table back as parquet and
compacting (sources/maintenance.compact_parquet) so downstream passes
scan row groups, not a million object-store keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_TO_KIND = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
}


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw scan: one row per file with its bytes. ``glob`` filters by
    file name at listing time (``pathGlobFilter``), so excluded files
    are never opened."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def ingest_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of media files → MEDIA_SCHEMA rows: stable media_id
    from the path hash, kind inferred from the extension ('binary' when
    unknown), metadata left null for the decode pass to fill."""
    raw = read_binary_dir(spark, path, glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.lit("binary")
    for e, k in sorted(_EXT_TO_KIND.items()):
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("media_id"),
        kind.alias("kind"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None)
        .cast(
            "struct<width:int,height:int,duration_ms:bigint,sample_rate:int>"
        )
        .alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def media_dir_stats(df: DataFrame) -> DataFrame:
    """Per-kind ingestion stats (count, bytes) — the sanity check before
    kicking off a decode pass over petabytes."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
