"""Plan-shape regressions for the round-2 operator families: the
physical plan is the contract — a rewrite that silently introduces a
cartesian product, a global sort, or an extra shuffle would pass the
value tests and still be wrong at 100 TB."""

import re

from pyspark.sql import functions as F

from det_module_spark.operators.basket import basket_affinity
from det_module_spark.operators.fuzzyjoin import edit1_pairs
from det_module_spark.operators.incremental import merge_agg_state, partial_agg
from det_module_spark.operators.privacy import pseudonymize
from det_module_spark.operators.sampling import weighted_hash_sample
from det_module_spark.operators.sequence import event_transitions
from det_module_spark.operators.setsim import jaccard_prefix_pairs
from det_module_spark.sources.tables import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fuzzy_join_is_equi_join_not_cartesian(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plan = _explain(edit1_pairs(cust, "c_custkey", "c_name"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation is a hash/sort-merge equi-join on the band
    assert "band" in plan


def test_setsim_no_cartesian_and_broadcast_freq(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(jaccard_prefix_pairs(docs, threshold=0.5, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the document-frequency table broadcasts into the rarity ranking
    assert "BroadcastHashJoin" in plan


def test_basket_supports_broadcast(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    plan = _explain(basket_affinity(baskets, "l_orderkey", "p_brand", 3))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_incremental_merge_single_join_partial_aggs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_orderkey").alias("v")
    )
    spec = dict(sum_cols={"s": "v"})
    st = partial_agg(ev.filter(F.col("v") % 2 == 0), ["o_orderpriority"], **spec)
    dl = partial_agg(ev.filter(F.col("v") % 2 == 1), ["o_orderpriority"], **spec)
    plan = _explain(merge_agg_state(st, dl, ["o_orderpriority"], ["s"]))
    # exactly one join (the full-outer state merge)
    assert len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)) >= 1
    # partial aggregation (map-side combine) present in both inputs
    assert plan.count("partial_sum") >= 2


def test_pseudonymize_is_shuffle_free(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    plan = _explain(pseudonymize(cust, ["c_custkey"], salt="s"))
    assert "Exchange" not in plan  # pure scan projection


def test_weighted_sample_uses_takeordered_not_global_sort(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("w")
    )
    plan = _explain(
        weighted_hash_sample(orders, F.col("w"), F.col("o_orderkey"), 100)
    )
    # top-k selection, not a full sort of the losers
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_event_transitions_single_user_shuffle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = _explain(event_transitions(ev))
    # the lead window exchanges on user_id; transition agg + row-total
    # window exchange on the tiny matrix are the only other exchanges
    assert "hashpartitioning(user_id" in plan
    assert "CartesianProduct" not in plan
