"""Guard on the exact-verifier broadcast entry points (VERDICT r04 #4).

embedding_near_dup_pairs / hard_negatives broadcast their probe /
anchor side; with the side defaulted to the whole corpus the guard
must refuse above max_broadcast_rows, and stay silent below it or
when a bounded side is passed explicitly.
"""

import pytest
from pyspark.sql import functions as F

from det_module_spark.operators.dedup import (
    embedding_near_dup_pairs,
    guard_broadcast_side,
)
from det_module_spark.operators.similarity import hard_negatives


def _emb(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 3).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 2).cast("int").alias("label"),
    )


def test_guard_trips_over_limit(spark):
    with pytest.raises(ValueError, match="broadcast side"):
        guard_broadcast_side(spark.range(100), "x", "y", max_rows=99)


def test_guard_silent_at_limit(spark):
    guard_broadcast_side(spark.range(100), "x", "y", max_rows=100)


def test_near_dup_pairs_refuses_full_corpus(spark):
    emb = _emb(spark, 50)
    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup_pairs(emb, max_broadcast_rows=10).collect()


def test_near_dup_pairs_explicit_probe_bypasses_guard(spark):
    emb = _emb(spark, 50)
    # explicit bounded probe: no guard, runs fine even with a tiny cap
    rows = embedding_near_dup_pairs(
        emb, probe=emb.filter(F.col("vec_id") < 5), max_broadcast_rows=10
    ).collect()
    assert all(r.id_a < r.id_b for r in rows)


def test_hard_negatives_refuses_full_corpus(spark):
    emb = _emb(spark, 50)
    with pytest.raises(ValueError, match="hard_negatives"):
        hard_negatives(emb, k=2, max_broadcast_rows=10).collect()


def test_hard_negatives_explicit_anchor_bypasses_guard(spark):
    emb = _emb(spark, 50)
    rows = hard_negatives(
        emb,
        k=2,
        anchors=emb.filter(F.col("vec_id") < 3),
        max_broadcast_rows=10,
    ).collect()
    assert rows and all(r.rank <= 2 for r in rows)
