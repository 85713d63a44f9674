"""mapInArrow variants of the multimodal kernels (round-8 growth
item): row-identical to the mapInPandas paths, including NULL and
empty blobs."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from det_module_spark.operators.multimodal import (
    decode_features,
    decode_features_arrow,
    media_from_documents,
    sample_pixels,
    sample_pixels_arrow,
)


def _media(spark):
    rows = [
        Row(media_id=1, kind="image", content=bytes(range(200)),
            mime="x", meta=Row(width=1, height=1, duration_ms=1, sample_rate=1)),
        Row(media_id=2, kind="audio", content=b"",
            mime="x", meta=Row(width=1, height=1, duration_ms=1, sample_rate=1)),
        Row(media_id=3, kind="video", content=None,
            mime="x", meta=Row(width=1, height=1, duration_ms=1, sample_rate=1)),
        Row(media_id=4, kind="image", content=b"abc",
            mime="x", meta=Row(width=1, height=1, duration_ms=1, sample_rate=1)),
    ]
    return spark.createDataFrame(rows)


def test_sample_pixels_arrow_matches_pandas(spark):
    media = _media(spark)
    a = {r["media_id"]: r["px"] for r in sample_pixels(media, n=16).collect()}
    b = {r["media_id"]: r["px"] for r in sample_pixels_arrow(media, n=16).collect()}
    assert a == b
    assert b[3] is None and b[2] is None  # NULL and empty blobs
    assert len(b[1]) == 16


def test_decode_features_arrow_matches_pandas(spark):
    media = _media(spark)
    key = lambda r: (r["media_id"], r["kind"], r["n_bytes"],  # noqa: E731
                     r["content_md5"], tuple(r["feature"] or []))
    a = sorted(map(key, decode_features(media).collect()))
    b = sorted(map(key, decode_features_arrow(media).collect()))
    assert a == b


def test_arrow_kernels_on_documents_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_from_documents(docs)
    a = {r["media_id"]: r["px"] for r in sample_pixels(media).collect()}
    b = {r["media_id"]: r["px"] for r in sample_pixels_arrow(media).collect()}
    assert a == b
    fa = {r["media_id"]: (r["n_bytes"], r["content_md5"], tuple(r["feature"]))
          for r in decode_features(media).collect()}
    fb = {r["media_id"]: (r["n_bytes"], r["content_md5"], tuple(r["feature"]))
          for r in decode_features_arrow(media).collect()}
    assert fa == fb
