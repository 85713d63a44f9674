"""Plan-shape regressions for the round-3 second-half operators."""

import re

from pyspark.sql import functions as F

from det_module_spark.sources.tables import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_kmv_global_has_no_global_window(spark, sf_dir):
    """Global KMV is a distributed TakeOrdered, never the
    single-partition Window anti-pattern."""
    from det_module_spark.operators.sketch import kmv_distinct

    li = load_table(spark, sf_dir, "lineitem")
    plan = _explain(kmv_distinct(li, F.col("l_partkey"), k=32))
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_kmv_grouped_window_is_partitioned(spark, sf_dir):
    from det_module_spark.operators.sketch import kmv_distinct

    li = load_table(spark, sf_dir, "lineitem")
    plan = _explain(
        kmv_distinct(li, F.col("l_partkey"), k=32, by=["l_returnflag"])
    )
    # the rank window partitions on the group key (no empty
    # partition-spec window anywhere)
    assert "hashpartitioning(l_returnflag" in plan


def test_shard_plan_window_is_partitioned(spark, sf_dir):
    from det_module_spark.operators.layout import shard_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(
        shard_plan(docs, "n_chars", "doc_id", 32_768, by=["source"])
    )
    assert "hashpartitioning(source" in plan
    # prefix-sum window + final agg: no single-partition exchange
    assert "SinglePartition" not in plan


def test_containment_join_is_equi_on_shingle(spark, sf_dir):
    """The pair join must be a hash/sort-merge EQUI-join keyed on the
    shingle hash — never a nested-loop / cartesian product."""
    from det_module_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents").limit(50)
    plan = _explain(containment_pairs(docs, n=3, threshold=0.3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_hard_negatives_broadcasts_anchors(spark, sf_dir):
    """Anchors are the broadcast side; the corpus never shuffles its
    vectors for the join itself (the only exchange is the per-anchor
    rank window)."""
    from det_module_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10)
    plan = _explain(hard_negatives(emb, k=3, anchors=anchors))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "hashpartitioning(anchor_id" in plan


def test_bpe_encode_is_projection_only(spark, sf_dir):
    """Encode is chained string replaces: a pure projection, no
    exchange, no Python."""
    from det_module_spark.operators.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(bpe_encode(docs, [("a", "b"), ("ab", "c")]))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_mixture_is_shuffle_free(spark, sf_dir):
    """Applying a mixture is explode+filter over the scan — the only
    aggregation (the count) happened at rate-derivation time."""
    from det_module_spark.operators.sampling import apply_mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = apply_mixture(
        docs,
        F.col("doc_id"),
        F.col("source"),
        {"src0": 2.5, "src1": 0.5},
        default_rate=1.0,
    )
    assert "Exchange" not in _explain(out)
