"""As-of join semantics, TF-IDF ranking, embedding near-dup."""

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from det_module_spark.operators.asof import asof_join
from det_module_spark.operators.dedup import embedding_near_dup_pairs
from det_module_spark.operators.text import tfidf_top_terms


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m, 0)


def test_asof_join_semantics(spark):
    probe = spark.createDataFrame(
        [
            Row(event_id=1, user_id=7, ts=_ts(10)),
            Row(event_id=2, user_id=7, ts=_ts(30)),
            Row(event_id=3, user_id=7, ts=_ts(5)),   # before any build row
            Row(event_id=4, user_id=8, ts=_ts(20)),  # other key
        ]
    )
    build = spark.createDataFrame(
        [
            Row(user_id=7, ts=_ts(10), value=1.0),   # exact tie -> matches
            Row(user_id=7, ts=_ts(20), value=2.0),
            Row(user_id=7, ts=_ts(20), value=5.0),   # dup ts -> max wins
            Row(user_id=9, ts=_ts(1), value=9.0),    # other key only
        ]
    )
    out = {
        r["event_id"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(probe, build, "user_id", "ts", ["value"]).collect()
    }
    assert out[1] == (1.0, _ts(10))     # inclusive tie
    assert out[2] == (5.0, _ts(20))     # latest build <= probe; dup->max
    assert out[3] == (None, None)       # no earlier build row
    assert out[4] == (None, None)       # key with no build rows
    assert len(out) == 4                # left join: all probes survive


def test_tfidf_ranks_discriminative_terms(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="common common zebra"),
            Row(doc_id=1, text="common yak yak"),
            Row(doc_id=2, text="common walrus"),
        ]
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears everywhere -> idf ln(4/4)=0; unique terms win
    assert top == {0: "zebra", 1: "yak", 2: "walrus"}
    scores = {r["doc_id"]: r["score"] for r in out}
    # doc 1 has tf=2 on its unique term -> double the score of tf=1 docs
    assert math.isclose(scores[1], 2 * scores[0])


def test_embedding_near_dup(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.99, 0.14]),  # cos ~0.99 with 0
        Row(vec_id=2, embedding=[0.0, 1.0]),    # orthogonal to 0
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] > 0.98


def test_embedding_near_dup_lsh_subset_and_recall(spark, sf_dir):
    """The LSH composition returns a SUBSET of the exact verifier's
    pairs with identical cosines (candidates only miss, never invent
    or distort), and at (4 planes, 8 tables) recall on the test
    embeddings is high."""
    from det_module_spark.operators.dedup import embedding_near_dup_lsh
    from det_module_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_lsh(
            emb, threshold=0.35, n_planes=4, n_tables=8
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]  # exact predicate on candidates: same cos
    assert len(lsh) >= 0.5 * len(exact), (len(lsh), len(exact))


def test_asof_forward_and_tolerance(spark):
    from pyspark.sql import functions as F

    from det_module_spark.operators.asof import asof_join

    probe = spark.createDataFrame(
        [(1, 100.0), (1, 200.0), (2, 50.0)], ["k", "t"]
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    build = spark.createDataFrame(
        [(1, 150.0, 7.0), (1, 100.0, 5.0), (2, 400.0, 9.0)],
        ["k", "t", "v"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")

    fwd = {
        (r["k"], int(r["t"].timestamp())): r["asof_v"]
        for r in asof_join(
            probe, build, "k", "t", ["v"], direction="forward"
        ).collect()
    }
    # equal-ts build matches forward; next-at-or-after otherwise
    assert fwd[(1, 100)] == 5.0
    assert fwd[(1, 200)] is None  # nothing at-or-after 200 for k=1
    assert fwd[(2, 50)] == 9.0

    tol = {
        (r["k"], int(r["t"].timestamp())): r["asof_v"]
        for r in asof_join(
            probe,
            build,
            "k",
            "t",
            ["v"],
            direction="forward",
            tolerance_seconds=60,
        ).collect()
    }
    assert tol[(1, 100)] == 5.0     # gap 0 <= 60
    assert tol[(2, 50)] is None     # nearest is 350s away: outside

    back_tol = {
        (r["k"], int(r["t"].timestamp())): r["asof_v"]
        for r in asof_join(
            probe, build, "k", "t", ["v"], tolerance_seconds=40
        ).collect()
    }
    assert back_tol[(1, 200)] is None  # latest-before is 150, gap 50 > 40
    assert back_tol[(1, 100)] == 5.0
