"""JSONL corpus source: round-trip, corrupt-line quarantine."""

import json

from det_module_spark.sources.jsonl import read_jsonl, split_corrupt, write_jsonl
from det_module_spark.sources.tables import load_table


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    path = str(tmp_path / "corpus")
    write_jsonl(docs, path)
    back, quarantine = split_corrupt(read_jsonl(spark, path))
    assert quarantine.count() == 0
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    src = tmp_path / "dirty.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "fr", "source": "s"}),
    ]
    src.write_text("\n".join(lines) + "\n")
    clean, quarantine = split_corrupt(read_jsonl(spark, str(src)))
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0]["raw_line"].startswith("{this")


def test_kv_records_fast_equals_udtf(spark):
    from det_module_spark.operators.semistructured import kv_records

    df = spark.createDataFrame(
        [(1, "a=1,b=2,junk"), (2, "c=x=y"), (3, ""), (4, None)],
        ["id", "s"],
    )
    fast = sorted(map(tuple, kv_records(df, "s").collect()))
    slow = sorted(map(tuple, kv_records(df, "s", use_udtf=True).collect()))
    assert fast == slow
    assert fast == [
        (1, "a=1,b=2,junk", "a", "1"),
        (1, "a=1,b=2,junk", "b", "2"),
        (2, "c=x=y", "c", "x=y"),
    ]
