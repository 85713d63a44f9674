"""Tests for pseudonymization, k-anonymity, FD checking, dictionary
encoding, and bigram-backoff LM scoring."""

import math

from pyspark.sql import functions as F

from det_module_spark.operators.privacy import (
    k_anonymity_report,
    pseudonymize,
)
from det_module_spark.operators.quality import (
    dictionary_encode,
    fd_violations,
)
from det_module_spark.operators.text import bigram_logprob


def test_pseudonymize_stable_and_join_preserving(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(1, 10), (1, 11), (3, 12)], "k long, w long")
    pa = pseudonymize(a, ["k"], salt="t")
    pb = pseudonymize(b, ["k"], salt="t")
    joined = pa.join(pb, "k").collect()
    assert len(joined) == 2  # key 1 matched twice, raw values gone
    assert all(len(r["k"]) == 16 for r in joined)
    # different salt -> different tokens (no cross-dataset linkage)
    pa2 = pseudonymize(a, ["k"], salt="other")
    assert pa.join(pa2, "k").count() == 0


def test_pseudonymize_null_and_keep_raw(spark):
    df = spark.createDataFrame([(None,), ("v",)], "c string")
    out = pseudonymize(df, ["c"], salt="t", keep_raw=True).collect()
    byraw = {r["c"]: r["c_pid"] for r in out}
    assert byraw[None] is None and len(byraw["v"]) == 16


def test_k_anonymity_report(spark):
    rows = [("a", 1)] * 5 + [("b", 1)] * 2
    df = spark.createDataFrame(rows, "q1 string, q2 long")
    got = {r["q1"]: (r["n_rows"], r["is_risky"]) for r in k_anonymity_report(df, ["q1", "q2"], k=5).collect()}
    assert got == {"a": (5, False), "b": (2, True)}


def test_fd_violations(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "z")],
        "a long, b string",
    )
    got = fd_violations(df, ["a"], "b").collect()
    assert len(got) == 1
    assert got[0]["a"] == 2 and got[0]["n_rhs_values"] == 2
    # holds -> empty
    ok = spark.createDataFrame([(1, "x"), (1, "x")], "a long, b string")
    assert fd_violations(ok, ["a"], "b").count() == 0


def test_dictionary_encode_roundtrip(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], "v string"
    )
    d, enc = dictionary_encode(df, "v")
    codes = {r["v"]: r["code"] for r in d.collect()}
    assert codes == {"a": 1, "b": 2, "c": 3}  # value-ordered dense codes
    assert sorted(r["code"] for r in enc.collect()) == [1, 1, 2, 3]


def test_bigram_logprob_seen_and_backoff(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id int, text string"
    )
    # "a b" seen 3x out of c1(a)=3 -> ln(1); "b z" unseen -> backoff
    score = spark.createDataFrame(
        [(10, "a b"), (11, "b z")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in bigram_logprob(train, score).collect()}
    assert got[10]["n_bigrams"] == 1
    assert got[10]["avg_logprob"] == 0.0  # ln(3/3)
    # backoff: z unseen unigram -> coalesce cw=1; total tokens = 8
    want = math.floor(math.log(0.4 * 1 / 8) * 1e9 + 0.5) / 1e9
    want = math.floor(want * 1e6 + 0.5) / 1e6
    assert got[11]["avg_logprob"] == want
