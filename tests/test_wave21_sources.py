"""Units for the round-5 wave-21 sources: fixed-width text and
varint-delimited protobuf record files."""

import os


FW_SPECS = [
    ("id", 1, 6, "long"),
    ("name", 7, 10, "string"),
    ("qty", 17, 5, "long"),
    ("price", 22, 8, "double"),
]


def test_fixedwidth_round_trip(spark, tmp_path):
    from det_module_spark.sources.fixedwidth import (
        read_fixedwidth,
        write_fixedwidth,
    )

    rows = [
        (1, "alpha", 10, 1.5),
        (22, "beta gamma", None, -2.25),
        (333, None, 7, None),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "qty", "price"])
    path = str(tmp_path / "fw")
    write_fixedwidth(df, path, FW_SPECS)
    back = read_fixedwidth(spark, path, FW_SPECS)
    got = sorted(
        (r["id"], r["name"], r["qty"], r["price"])
        for r in back.collect()
    )
    assert got == sorted(rows)


def test_fixedwidth_truncates_at_field_width(spark, tmp_path):
    from det_module_spark.sources.fixedwidth import (
        read_fixedwidth,
        write_fixedwidth,
    )

    df = spark.createDataFrame(
        [(1, "averyverylongname", 2, 3.0)],
        ["id", "name", "qty", "price"],
    )
    path = str(tmp_path / "fw2")
    write_fixedwidth(df, path, FW_SPECS)
    r = read_fixedwidth(spark, path, FW_SPECS).collect()[0]
    assert r["name"] == "averyveryl"  # 10-char slot
    assert r["qty"] == 2


def test_fixedwidth_malformed_numeric_is_null_not_fatal(spark, tmp_path):
    from det_module_spark.sources.fixedwidth import read_fixedwidth

    p = tmp_path / "fw3"
    p.mkdir()
    (p / "part-0.txt").write_text(
        "000001hello     12ab 3.5     \n", encoding="utf-8"
    )
    r = read_fixedwidth(spark, str(p), FW_SPECS).collect()[0]
    assert r["id"] == 1 and r["name"] == "hello"
    assert r["qty"] is None  # '12ab' -> NULL, scan survives
    assert r["price"] == 3.5


PB_FIELDS = [
    (1, "doc_id", "int64"),
    (2, "text", "string"),
    (3, "score", "double"),
]


def test_proto_records_round_trip_multishard(spark, tmp_path):
    from det_module_spark.sources.protorecords import (
        read_proto_records,
        write_proto_records,
    )

    rows = [
        (i, "hällo-%d" % i, i * 0.5 - 3) for i in range(50)
    ] + [(-7, None, None)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "score"]
    ).repartition(4)
    path = str(tmp_path / "pb")
    write_proto_records(df, path, PB_FIELDS)
    shards = [f for f in os.listdir(path) if f.endswith(".pbrec")]
    assert len(shards) == 4  # one shard per partition = read tasks
    back = read_proto_records(spark, path, PB_FIELDS)
    got = sorted(
        (r["doc_id"], r["text"], r["score"]) for r in back.collect()
    )
    assert got == sorted(rows)


def test_proto_records_skip_unknown_fields(tmp_path):
    """Forward compatibility: a stream with an extra field decodes."""
    from det_module_spark.sources.protorecords import (
        _decode_stream,
        _encode_record,
    )

    extra = [(9, "future", "string")] + PB_FIELDS
    buf = _encode_record(
        {"future": "x", "doc_id": 5, "text": "t", "score": 1.25}, extra
    )
    got = list(_decode_stream(buf, PB_FIELDS))
    assert got == [{"doc_id": 5, "text": "t", "score": 1.25}]


def test_proto_records_negative_int_round_trip(tmp_path):
    from det_module_spark.sources.protorecords import (
        _decode_stream,
        _encode_record,
    )

    buf = b"".join(
        _encode_record({"doc_id": v, "text": None, "score": None}, PB_FIELDS)
        for v in (-1, -(2**62), 2**62, 0)
    )
    got = [r["doc_id"] for r in _decode_stream(buf, PB_FIELDS)]
    assert got == [-1, -(2**62), 2**62, 0]
