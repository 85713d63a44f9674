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


def test_polygon_coverage_broadcast_single_agg(spark):
    """Round-2 coverage kernel: the edge side broadcasts (no shuffle
    of the cell grid for the join) and the whole reduction is ONE
    hash-aggregate pair — per-edge terms never hit a sort or a second
    exchange."""
    import re

    from det_module_spark.operators.geometry import polygon_coverage

    cells = spark.range(400).select(
        ((F.col("id") % 20) * 0.5).alias("minx"),
        ((F.col("id") / 20).cast("long") * 0.5).alias("miny"),
    )
    polys = spark.createDataFrame(
        [(0, [(1.0, 1.0), (5.0, 1.0), (5.0, 5.0), (1.0, 5.0)])],
        "asdf_id INT, ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
    )
    plan = _explain(polygon_coverage(cells, polys, cell_size=0.5))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    # VERDICT r02 #1: the edge join is an EQUI-join on the x-slab key,
    # not a crossJoin — slab pruning bounds per-cell edge candidates
    assert "BroadcastHashJoin" in plan, plan
    assert "__cell_slab" in plan and "__cov_slab" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # exactly one shuffle: the final aggregation's hashpartitioning
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) == 1, plan
    assert "hashpartitioning" in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2  # partial+final


def test_lsh_topk_no_corpus_shuffle_before_bucket_join(spark, sf_dir):
    """ANN scale contract: the corpus flows scan → signature project →
    bucket equi-join; the only hashpartitioning exchanges belong to
    the candidate distinct + rank window, never a corpus-wide sort
    before the join, and the query side broadcasts."""
    from det_module_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_planes=4, n_tables=8
    )
    plan = _explain(out)
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_skew_join_aqe_split_fires(spark, sf_dir):
    """VERDICT r02 #6: the zipfian join's hot partition is split by
    AQE's skew-join handling. Thresholds are lowered to make the
    sf-scale hot partition (60% of lineitem) qualify — at 100 TB the
    defaults (256 MB) trip on their own."""
    from __spark_entry__ import _skewed_fact_dim

    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(keys[0], "800")
        spark.conf.set(keys[1], "800")
        spark.conf.set(keys[2], "1.0")
        fact, dim = _skewed_fact_dim(spark, sf_dir)
        # AQE splits a skewed reduce partition along MAP-output
        # boundaries; a single-file scan is ONE map, so give the
        # fact side a realistic multi-task upstream stage first
        joined = fact.repartition(20).join(dim.hint("merge"), "skew_key")
        joined.collect()  # execute THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equals_plain_and_spreads_key(spark, sf_dir):
    """salted_join output == plain join output (salting is partition-
    layout only), and the physical join key includes the salt."""
    from __spark_entry__ import _skewed_fact_dim
    from det_module_spark.operators.skew import salted_join

    fact, dim = _skewed_fact_dim(spark, sf_dir)
    fact = fact.limit(20000)
    plain = (
        fact.join(dim, "skew_key")
        .groupBy("skew_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w"))
    )
    salted = (
        salted_join(fact, dim, "skew_key", n_salts=8)
        .groupBy("skew_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w"))
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b
    plan = _explain(salted_join(fact, dim, "skew_key", n_salts=8))
    assert "_salt" in plan  # join condition carries the salt column


def test_edge_coverage_term_is_codegen(spark):
    """The per-(cell, edge) closed-form term must stay inside
    whole-stage codegen — no Python, no interpreted HOF eval."""
    from det_module_spark.operators.geometry import polygon_coverage

    cells = spark.range(100).select(
        ((F.col("id") % 10) * 1.0).alias("minx"),
        ((F.col("id") / 10).cast("long") * 1.0).alias("miny"),
    )
    polys = spark.createDataFrame(
        [(0, [(0.5, 0.5), (7.5, 0.5), (0.5, 7.5)])],
        "asdf_id INT, ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
    )
    plan = _explain(polygon_coverage(cells, polys, cell_size=1.0))
    # no Python evaluation nodes anywhere: the closed-form term is a
    # plain CASE/arithmetic Project (codegen-eligible; the formatted
    # AQE plan doesn't materialize WholeStageCodegen spans until
    # execution, so assert the absence of the slow paths instead)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "cov_term" in plan  # the term is a single Project column
