"""Declarative data-quality expectations (operators/expectations.py):
rule semantics, null handling, and the one-pass plan guarantee."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F  # noqa: F401

from det_module_spark.operators.expectations import expectations_report


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            Row(id=1, score=50.0, status="O", code="1-HIGH"),
            Row(id=2, score=150.0, status="F", code="2-LOW"),     # score out of range
            Row(id=2, score=None, status="X", code="bad"),        # dup id, bad status+code
            Row(id=4, score=30.0, status="O", code=None),
            Row(id=None, score=-5.0, status=None, code="3-MED"),  # null id, negative
        ]
    )


def test_rule_semantics(messy):
    rules = [
        {"col": "id", "rule": "not_null"},
        {"col": "id", "rule": "unique", "exact": True},
        {"col": "score", "rule": "between", "lo": 0, "hi": 100},
        {"col": "status", "rule": "in_set", "values": ["O", "F"]},
        {"col": "code", "rule": "matches", "pattern": "^[0-9]-[A-Z]+$"},
        {"col": "score", "rule": "max_null_frac", "frac": 0.25},
    ]
    rep = {
        (r["col"], r["rule"]): r
        for r in expectations_report(messy, rules).collect()
    }
    assert rep[("id", "not_null")]["n_violations"] == 1
    assert not rep[("id", "not_null")]["passed"]
    # 4 non-null ids, 3 distinct -> 1 duplicate
    assert rep[("id", "unique")]["n_violations"] == 1
    # 150 and -5 out of range; null score is NOT a between violation
    assert rep[("score", "between")]["n_violations"] == 2
    assert rep[("status", "in_set")]["n_violations"] == 1
    assert rep[("code", "matches")]["n_violations"] == 1
    # 1 null score of 5 rows = 0.2 <= 0.25 threshold -> passes
    assert rep[("score", "max_null_frac")]["n_violations"] == 1
    assert rep[("score", "max_null_frac")]["passed"]
    assert all(r["n_rows"] == 5 for r in rep.values())


def test_all_rules_one_aggregation_pass(spark, messy):
    rules = [
        {"col": "id", "rule": "not_null"},
        {"col": "score", "rule": "between", "lo": 0, "hi": 100},
        {"col": "status", "rule": "in_set", "values": ["O", "F"]},
    ]
    plan = expectations_report(messy, rules)._sc._jvm.PythonSQLUtils.explainString(
        expectations_report(messy, rules)._jdf.queryExecution(), "formatted"
    )
    # a single partial+final aggregate over one scan; no join, no union
    import re

    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2
    assert "Union" not in plan and "Join" not in plan


def test_empty_frame_and_unknown_rule(spark):
    empty = spark.createDataFrame([], "x INT")
    rep = expectations_report(empty, [{"col": "x", "rule": "not_null"}])
    row = rep.collect()[0]
    assert row["n_rows"] == 0 and row["passed"]
    with pytest.raises(ValueError, match="unknown rule"):
        expectations_report(empty, [{"col": "x", "rule": "nope"}]).collect()


def test_windowed_expectations_stream_matches_batch(spark, tmp_path):
    """The same windowed_expectations expression runs as a streaming
    aggregation (readStream + watermark) and produces exactly the
    batch result — data-quality monitoring as an incremental state
    machine."""
    import datetime

    from det_module_spark.operators.expectations import (
        windowed_expectations,
    )

    schema = "ts TIMESTAMP, user_id STRING, value DOUBLE, event_type STRING"

    def at(m):
        return datetime.datetime(2024, 1, 1, 10, 0) + datetime.timedelta(
            minutes=m
        )

    rows = [
        (at(5), "u1", 10.0, "view"),
        (at(20), None, 20.0, "click"),       # null user
        (at(40), "u2", 999.0, "view"),       # out of range
        (at(70), "u3", 30.0, "weird"),       # bad type
        (at(80), "u1", 40.0, "view"),
    ]
    rules = [
        {"col": "user_id", "rule": "not_null"},
        {"col": "value", "rule": "between", "lo": 0, "hi": 100},
        {"col": "event_type", "rule": "in_set", "values": ["view", "click"]},
    ]
    src = str(tmp_path / "exp_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    batch = windowed_expectations(
        spark.read.schema(schema).parquet(src), rules, window="1 hour"
    )
    stream_df = windowed_expectations(
        spark.readStream.schema(schema).parquet(src),
        rules,
        window="1 hour",
        watermark="1 hour",
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("exp_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    def key(r):
        return tuple(r[c] for c in sorted(r.asDict()))

    got = sorted(key(r) for r in spark.sql("SELECT * FROM exp_out").collect())
    want = sorted(key(r) for r in batch.collect())
    assert got == want
    # sanity on content: hour-1 window has 1 null-user + 1 range
    # violation, hour-2 has the bad event type
    m = {
        (r["window_start"], r["col"]): r["n_violations"]
        for r in batch.collect()
    }
    assert m[("2024-01-01 10:00:00", "user_id")] == 1
    assert m[("2024-01-01 10:00:00", "value")] == 1
    assert m[("2024-01-01 11:00:00", "event_type")] == 1


def test_windowed_expectations_rejects_unique(spark):
    from det_module_spark.operators.expectations import (
        windowed_expectations,
    )

    df = spark.createDataFrame([], "ts TIMESTAMP, x INT")
    with pytest.raises(ValueError, match="unique"):
        windowed_expectations(df, [{"col": "x", "rule": "unique"}])
