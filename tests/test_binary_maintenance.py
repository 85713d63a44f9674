"""binaryFile ingestion and parquet compaction tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from det_module_spark.sources.binary import ingest_media_dir, media_dir_stats
from det_module_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_count,
)


def test_ingest_media_dir(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (d / "b.wav").write_bytes(b"RIFFfakewav")
    (d / "c.mp4").write_bytes(b"\x00\x00fakemp4")
    (d / "d.xyz").write_bytes(b"unknown")
    media = ingest_media_dir(spark, str(d))
    rows = {r.source_path.split("/")[-1]: r for r in media.collect()}
    assert rows["a.jpg"].kind == "image" and rows["a.jpg"].n_bytes == 10
    assert rows["b.wav"].kind == "audio"
    assert rows["c.mp4"].kind == "video"
    assert rows["d.xyz"].kind == "binary"
    assert rows["a.jpg"].content == b"\xff\xd8fakejpeg"
    assert len({r.media_id for r in rows.values()}) == 4  # ids distinct
    stats = {r.kind: r for r in media_dir_stats(media).collect()}
    assert stats["image"].n_files == 1 and stats["image"].total_bytes == 10


def test_ingest_glob_filters_at_listing(spark, tmp_path):
    d = tmp_path / "media2"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"x")
    (d / "b.wav").write_bytes(b"y")
    only_img = ingest_media_dir(spark, str(d), glob="*.jpg")
    assert [r.kind for r in only_img.collect()] == ["image"]


def test_ingested_media_decodes(spark, tmp_path):
    from det_module_spark.operators.multimodal import decode_features

    d = tmp_path / "media3"
    d.mkdir()
    (d / "a.png").write_bytes(bytes(range(32)))
    media = ingest_media_dir(spark, str(d)).select(
        "media_id", "kind", "content", "mime", "meta"
    )
    out = decode_features(media).collect()
    assert len(out) == 1 and len(out[0].feature) == 8


def test_compact_parquet(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(40).write.parquet(p)
    assert parquet_file_count(p) == 40
    before = sorted((r.id, r.v) for r in spark.read.parquet(p).collect())
    n = compact_parquet(spark, p, target_rows_per_file=500)
    assert n == 2 == parquet_file_count(p)
    after = sorted((r.id, r.v) for r in spark.read.parquet(p).collect())
    assert after == before
