"""Plan-shape regressions for the newer operators: the physical plan,
not just the result, is the contract — a rewrite that silently adds a
shuffle or drops a pushdown would pass value tests and still be wrong
at 100 TB."""

from pyspark.sql import functions as F

from det_module_spark.operators.chunking import chunk_documents, pack_sequences
from det_module_spark.operators.sampling import hash_sample
from det_module_spark.sources.tables import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_chunking_is_shuffle_free(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(chunk_documents(docs))
    # a projection + generate: no exchange of any kind
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_sampling_is_shuffle_free_and_prunes_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = hash_sample(docs, F.col("doc_id"), 0.1).select("doc_id")
    plan = _explain(out)
    assert "Exchange" not in plan
    # column pruning reaches the scan: only doc_id read
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_pack_sequences_single_shuffle_on_shard_key(spark, sf_dir):
    import re

    docs = load_table(spark, sf_dir, "documents")
    plan = _explain(pack_sequences(docs, budget=256, part_col="lang"))
    # exactly one exchange node: the window partition on lang
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(lang" in plan


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 200
    ).select("l_orderkey", "l_quantity")
    plan = _explain(li)
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,200)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_time_fill_no_event_rescan(spark, sf_dir):
    """The raw event table is scanned exactly once — grid generation
    and fill both read the materialized bucket table, so the final
    plan contains no parquet scan at all (the one scan happened at
    bucket-table checkpoint time)."""
    import re

    from det_module_spark.operators.timefill import time_fill_locf

    ev = load_table(spark, sf_dir, "events")
    plan = _explain(time_fill_locf(ev, unit="hour"))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0
    assert "ExistingRDD" in plan


def test_decontaminate_broadcasts_benchmark_vocab(spark, sf_dir):
    """The corpus is never shuffled by shingle: the benchmark
    vocabulary moves to the data (BroadcastExchange), and the only
    hash exchanges are the benchmark DISTINCT and the per-doc count."""
    import re

    from det_module_spark.operators.decontaminate import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    rep = contamination_report(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
    )
    plan = _explain(rep)
    assert "BroadcastExchange" in plan
    hash_ex = re.findall(r"\(\d+\) Exchange hashpartitioning\(([a-z_]+)", plan)
    assert all(k in ("shingle", "doc_id") for k in hash_ex)
    # and never a corpus-sized shuffle: no exchange keyed by shingle
    # on the corpus side (the only shingle exchange is the tiny
    # benchmark distinct)
    assert len([k for k in hash_ex if k == "shingle"]) <= 1


def test_mixture_is_shuffle_free(spark, sf_dir):
    from det_module_spark.operators.sampling import apply_mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = apply_mixture(
        docs, F.col("doc_id"), F.col("source"), {"src0": 2.5}, default_rate=1.0
    )
    plan = _explain(out)
    assert "Exchange" not in plan


def test_window_cleaning_single_exchange(spark, sf_dir):
    """Imputation and z-scoring are one hash exchange each (the window
    partition), with no sort: unordered windows skip the sort step."""
    import re

    from det_module_spark.operators.cleaning import impute_group_mean, zscore_outliers

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", F.col("l_quantity").alias("qty")
    )
    for out in (
        impute_group_mean(li, "qty", "l_returnflag"),
        zscore_outliers(li, "qty", "l_returnflag"),
    ):
        plan = _explain(out)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_join_strategy_hints(spark, sf_dir):
    """The three physical join strategies are all reachable via hints —
    the per-workload tuning surface at 100 TB: broadcast for dims,
    shuffle-hash when one side is modest and sort is wasteful,
    sort-merge for fact-fact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = orders.o_orderkey == li.l_orderkey

    bc = li.join(orders.hint("broadcast"), cond)
    assert "BroadcastHashJoin" in _explain(bc)

    sh = li.join(orders.hint("shuffle_hash"), cond)
    assert "ShuffledHashJoin" in _explain(sh)

    sm = li.join(orders.hint("merge"), cond)
    assert "SortMergeJoin" in _explain(sm)
