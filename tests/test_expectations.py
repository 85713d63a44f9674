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
