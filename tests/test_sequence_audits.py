"""Tests for event transitions, sequence gaps, Benford audit, and PSI
drift."""

import math

from pyspark.sql import functions as F

from det_module_spark.operators.quality import benford_audit, psi_drift
from det_module_spark.operators.sequence import (
    event_transitions,
    sequence_gaps,
)


def test_event_transitions_counts_and_probs(spark):
    rows = [
        (1, 100, "a", "2024-01-01 00:00:01"),
        (2, 100, "b", "2024-01-01 00:00:02"),
        (3, 100, "a", "2024-01-01 00:00:03"),
        (4, 200, "a", "2024-01-01 00:00:01"),
        (5, 200, "a", "2024-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    # user 100: a->b, b->a; user 200: a->a
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "a")] == (1, 0.5)
    assert got[("b", "a")] == (1, 1.0)


def test_event_transitions_tiebreak_same_timestamp(spark):
    rows = [
        (2, 1, "y", "2024-01-01 00:00:01"),
        (1, 1, "x", "2024-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    got = [tuple(r)[:2] for r in event_transitions(df).collect()]
    assert got == [("x", "y")]  # event_id tiebreak orders x before y


def test_sequence_gaps(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (5,), (6,), (9,)], "event_id long"
    )
    got = sorted(map(tuple, sequence_gaps(df, "event_id").collect()))
    assert got == [(3, 4, 2), (7, 8, 2)]
    # grouped: gaps computed per group
    g = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 2)], "g string, i long"
    )
    got2 = sorted(map(tuple, sequence_gaps(g, "i", group="g").collect()))
    assert got2 == [("a", 2, 2, 1)]


def test_benford_audit_uniform_digits(spark):
    # 1..9 once each: observed_p = 1/9 for every digit
    df = spark.createDataFrame([(float(d),) for d in range(1, 10)], "v double")
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d]["n"] == 1
        assert abs(got[d]["observed_p"] - 1 / 9) < 1e-5
        assert abs(got[d]["expected_p"] - math.log10(1 + 1 / d)) < 1e-5
    # leading zeros skipped: 0.042 -> digit 4. Since the dense 1-9
    # spine landed (review r6, "one row per digit" contract), absent
    # digits come back with n=0 — the hit is the single n=1 row.
    df2 = spark.createDataFrame([(0.042,)], "v double")
    counts = {r["digit"]: r["n"] for r in benford_audit(df2, "v").collect()}
    assert sorted(counts) == list(range(1, 10))
    assert counts[4] == 1 and sum(counts.values()) == 1


def test_psi_identical_distributions_zero(spark):
    a = spark.createDataFrame([(float(i % 5),) for i in range(50)], "v double")
    out = psi_drift(a, a, "v", 1.0).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["p_before"] == r["p_after"] for r in out)


def test_psi_one_sided_bin_floored(spark):
    before = spark.createDataFrame([(1.0,), (1.5,)], "v double")
    after = spark.createDataFrame([(1.0,), (9.0,)], "v double")
    got = {r["bin"]: r for r in psi_drift(before, after, "v", 1.0).collect()}
    # bin 9 exists only after: p_before floored to 1e-6, big positive term
    assert got[9]["n_before"] == 0 and got[9]["p_before"] == 1e-6
    assert got[9]["psi_term"] > 0
