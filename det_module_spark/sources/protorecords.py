"""Varint-delimited protobuf record files — source + sink.

The standard streaming-friendly protobuf container (what
``writeDelimitedTo`` / Kafka-dump tools emit): each record is a
length-prefixed message; fields use the public wire format
(varint ints, length-delimited UTF-8 strings, fixed64 doubles).
Encode/decode run on the repo's vendored pure-Python wire runtime
(vendor/protofallback — the same module that powers
transformWithState in this container), so the source works with or
without the real protobuf package installed.

Spark shape:
- **read**: ``binaryFile`` scan (one task per file — framed streams
  are not block-splittable, so parallelism = shard count; the writer
  emits one shard per partition for exactly that reason) →
  ``mapInPandas`` decode in Arrow batches.
- **write**: per-partition encode via ``foreachPartition`` to a
  shard file per partition (local/NFS paths; object stores take the
  same bytes through their put API).

Field spec: (field_number, name, kind) with kind ∈
{'int64', 'string', 'double'}. Unknown fields in the stream are
skipped (forward compatible); absent fields decode as NULL
(proto3 presence).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

FieldSpec = tuple[int, str, str]

_KIND_TO_SPARK = {"int64": "long", "string": "string", "double": "double"}
_MASK64 = (1 << 64) - 1
_MINI = None


def _wire():
    """Load the vendored wire runtime by FILE PATH — independent of
    how (or whether) a 'google' namespace resolves on this worker, so
    the codec works identically on the driver and inside executor
    Python workers."""
    global _MINI
    if _MINI is None:
        import importlib.util

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..",
            "vendor",
            "protofallback",
            "google",
            "protobuf",
            "_mini.py",
        )
        spec = importlib.util.spec_from_file_location(
            "det_module_spark_pbwire", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MINI = mod
    return _MINI


def _encode_record(row: dict, fields: list[FieldSpec]) -> bytes:
    _mini = _wire()

    body = bytearray()
    for num, name, kind in fields:
        v = row.get(name)
        if v is None:
            continue
        if kind == "int64":
            _mini.write_varint(body, (num << 3) | 0)
            _mini.write_varint(body, int(v) & _MASK64)
        elif kind == "double":
            _mini.write_varint(body, (num << 3) | 1)
            body += struct.pack("<d", float(v))
        elif kind == "string":
            raw = str(v).encode("utf-8")
            _mini.write_varint(body, (num << 3) | 2)
            _mini.write_varint(body, len(raw))
            body += raw
        else:  # pragma: no cover - spec error
            raise ValueError(f"unsupported kind {kind!r}")
    out = bytearray()
    _mini.write_varint(out, len(body))
    out += bytes(body)
    return bytes(out)


def _decode_stream(buf: bytes, fields: list[FieldSpec]) -> Iterator[dict]:
    _mini = _wire()

    pos = 0
    n = len(buf)
    while pos < n:
        length, pos = _mini.read_varint(buf, pos)
        raw = _mini.parse_raw(buf[pos : pos + length])
        pos += length
        rec: dict = {}
        for num, name, kind in fields:
            vals = raw.get(num)
            if not vals:
                rec[name] = None
                continue
            # wire-type guard on EVERY kind (forward compatibility:
            # a field number re-used at a different wire type decodes
            # to NULL instead of raising in the executor)
            wire, payload = vals[-1]  # last-writer-wins, per spec
            if kind == "int64":
                rec[name] = (
                    _mini._to_signed64(int(payload)) if wire == 0 else None
                )
            elif kind == "double":
                if wire == 1:
                    rec[name] = struct.unpack(
                        "<d", struct.pack("<Q", int(payload))
                    )[0]
                else:
                    rec[name] = None
            else:
                rec[name] = (
                    payload.decode("utf-8", errors="replace")
                    if wire == 2
                    and isinstance(payload, (bytes, bytearray))
                    else None
                )
        yield rec


def write_proto_records(
    df: DataFrame, path: str, fields: list[FieldSpec]
) -> None:
    """One ``part-NNNNN.pbrec`` shard per partition (shard count =
    read parallelism). OVERWRITE semantics, like every other sink
    here, but STAGED: the job writes every shard into a hidden
    staging directory first, and only after it succeeds are the old
    shards replaced — a failed re-write leaves the previous dataset
    fully intact and readable (deleting up front destroyed it before
    a single new byte was durable). The publish itself is per-file
    atomic (``os.replace``): same-numbered shards swap atomically,
    then stale higher-numbered shards from a wider previous write are
    removed — without that, ``read_proto_records`` silently globs
    them back in (resurrected rows). A crash mid-publish can leave a
    mix of old/new shards (the window is #files renames, not the
    whole job); readers must not run concurrently with a rewrite."""
    import glob
    import shutil
    import uuid

    os.makedirs(path, exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    os.makedirs(staging)
    names = [name for _n, name, _k in fields]
    spec = list(fields)

    def write_part(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # temp name carries the task ATTEMPT id: a speculative or
        # zombie duplicate attempt writing `.part-NNNNN.tmp` by
        # partition id alone would interleave with the live attempt
        # and publish a shard with garbled varint framing; per-attempt
        # temps make os.replace() a last-writer-wins of two COMPLETE
        # files instead.
        tmp = os.path.join(
            staging, f".part-{pid:05d}-{ctx.taskAttemptId()}.tmp"
        )
        out = os.path.join(staging, f"part-{pid:05d}.pbrec")
        with open(tmp, "wb") as f:
            for row in it:
                d = row.asDict()
                f.write(_encode_record({k: d.get(k) for k in names}, spec))
        os.replace(tmp, out)

    try:
        df.foreachPartition(write_part)
        fresh = sorted(glob.glob(os.path.join(staging, "part-*.pbrec")))
        published = set()
        for f in fresh:
            base = os.path.basename(f)
            os.replace(f, os.path.join(path, base))
            published.add(base)
        for stale in glob.glob(os.path.join(path, "*.pbrec")):
            if os.path.basename(stale) not in published:
                try:
                    os.remove(stale)
                except OSError:
                    pass
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def read_proto_records(
    spark: SparkSession, path: str, fields: list[FieldSpec]
) -> DataFrame:
    """Decode every ``*.pbrec`` shard under ``path`` into typed
    columns; Arrow-batched, one task per shard."""
    schema = ", ".join(
        f"{name} {_KIND_TO_SPARK[kind]}" for _n, name, kind in fields
    )
    spec = list(fields)
    names = [name for _n, name, _k in fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_decode_stream(bytes(content), spec))
            yield pd.DataFrame(rows, columns=names)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pbrec")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(decode, schema=schema)
