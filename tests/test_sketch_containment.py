"""KMV distinct sketch + asymmetric containment dedup."""

from pyspark.sql import functions as F


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct values are reported exactly."""
    from det_module_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(50)],
        ["g", "v"],
    )
    out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df, F.col("v"), k=64, by=["g"]).collect()
    }
    assert out == {"a": 7, "b": 3}


def test_kmv_ignores_nulls(spark):
    """NULL keys are dropped (countDistinct semantics) — they would
    otherwise sort differently across engines."""
    from det_module_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,), (None,)], "v int"
    )
    assert kmv_distinct(df, F.col("v"), k=8).collect()[0][0] == 2


def test_kmv_partition_independent(spark):
    """Min-k of a set doesn't depend on physical layout: estimates are
    identical at 1 partition and at 13."""
    from det_module_spark.operators.sketch import kmv_distinct

    rows = [(i % 5, i * 37 % 911) for i in range(3000)]
    a = spark.createDataFrame(rows, ["g", "v"]).repartition(1)
    b = spark.createDataFrame(rows, ["g", "v"]).repartition(13)
    ra = sorted(
        map(tuple, kmv_distinct(a, F.col("v"), k=32, by=["g"]).collect())
    )
    rb = sorted(
        map(tuple, kmv_distinct(b, F.col("v"), k=32, by=["g"]).collect())
    )
    assert ra == rb


def test_kmv_mergeable(spark):
    """Bottom-k of a union == bottom-k over the concatenated halves —
    the sketch property that makes map-side partial merge correct."""
    from det_module_spark.operators.sketch import kmv_distinct

    rows = [(i * 131 % 10007,) for i in range(4000)]
    whole = spark.createDataFrame(rows, ["v"])
    half1 = spark.createDataFrame(rows[:2000], ["v"])
    half2 = spark.createDataFrame(rows[2000:], ["v"])
    est_whole = kmv_distinct(whole, F.col("v"), k=48).collect()[0][0]
    est_merged = kmv_distinct(
        half1.unionAll(half2), F.col("v"), k=48
    ).collect()[0][0]
    assert est_whole == est_merged


def test_kmv_estimate_reasonable(spark):
    """KMV relative error for k=64 is ~1/sqrt(k-1) ≈ 13%; allow 3σ."""
    from det_module_spark.operators.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], ["v"])
    est = kmv_distinct(df, F.col("v"), k=64).collect()[0][0]
    assert abs(est - n) / n < 0.4


def test_containment_catches_pasted_doc(spark):
    """A small doc fully pasted inside a big one: containment fires
    where Jaccard stays below threshold."""
    from det_module_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    big = filler + " " + small + " " + filler.replace("w", "u")
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different text here")],
        ["doc_id", "text"],
    )
    cont = containment_pairs(df, n=3, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    # every shingle of doc 1 occurs in doc 2
    assert row["cont_a_in_b"] == 1.0
    assert row["cont_b_in_a"] < 0.1
    # Jaccard misses the same pair at the same bar
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.9).collect()
    assert jac == []


def test_containment_bounds_jaccard(spark, sf_dir):
    """max(containment) >= jaccard >= min(containment) on real pairs."""
    from det_module_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    cont = {
        (r["id_a"], r["id_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in containment_pairs(docs, n=3, threshold=0.0).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    assert set(jac) == set(cont)
    for pair, j in jac.items():
        ca, cb = cont[pair]
        assert max(ca, cb) >= j - 1e-12
        assert min(ca, cb) >= j - 1e-12  # inter/sz >= inter/union


def test_hard_negatives_label_and_rank_contract(spark, sf_dir):
    from det_module_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 10)
    out = hard_negatives(emb, k=3, anchors=anchors).collect()
    labels = {r["vec_id"]: r["label"] for r in anchors.collect()}
    by_anchor = {}
    for r in out:
        # never a same-label pair
        assert r["neg_label"] != labels[r["anchor_id"]]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for rows in by_anchor.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        # cos non-increasing with rank
        cs = [r["cos"] for r in rows]
        assert all(cs[i] >= cs[i + 1] for i in range(len(cs) - 1))


def test_hard_negatives_partition_independent(spark, sf_dir):
    from det_module_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 5)
    a = hard_negatives(emb.repartition(1), k=2, anchors=anchors).collect()
    b = hard_negatives(emb.repartition(11), k=2, anchors=anchors).collect()
    key = lambda r: (r["anchor_id"], r["rank"])
    assert sorted(map(tuple, a), key=lambda t: t[:2]) == sorted(
        map(tuple, b), key=lambda t: t[:2]
    )


def test_cluster_representatives_policy(spark):
    from det_module_spark.operators.graph import cluster_representatives

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (8, 4), (9, 1)],
        ["id", "score"],
    )
    out = {
        r["cluster"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
        for r in cluster_representatives(pairs, quality).collect()
    }
    # {1,2,3}: score tie 99 between 2 and 3 -> lowest id 2 wins
    assert out[1] == (2, 99, 3)
    # {7,8}: 7 wins on score
    assert out[7] == (7, 5, 2)
    # 9 is a singleton: own representative
    assert out[9] == (9, 1, 1)
    assert len(out) == 3


def test_cluster_representatives_string_ids(spark):
    """String doc ids: the tie-break negates the score, not the id,
    so non-numeric ids order correctly instead of casting to null
    (ADVICE r03)."""
    from det_module_spark.operators.graph import cluster_representatives

    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC")], ["id_a", "id_b"]
    )
    quality = spark.createDataFrame(
        [("docA", 10), ("docB", 99), ("docC", 99), ("docZ", 7)],
        ["id", "score"],
    )
    out = {
        r["cluster"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
        for r in cluster_representatives(pairs, quality).collect()
    }
    # tie at 99 between docB/docC -> lexicographically lowest id wins
    assert out["docA"] == ("docB", 99, 3)
    assert out["docZ"] == ("docZ", 7, 1)
    assert len(out) == 2


def test_temperature_rates_rebalance(spark):
    """α=0.5 temperature: small sources up-weighted, large ones
    down-weighted; realized row count lands near the budget."""
    from det_module_spark.operators.sampling import (
        apply_mixture,
        temperature_rates,
    )

    rows = [(i, "small" if i < 100 else "big") for i in range(10100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    counts = {"small": 100, "big": 10000}
    rates = temperature_rates(counts, budget_rows=10100)
    assert rates["small"] > 5.0 and rates["big"] < 1.0
    out = apply_mixture(
        df, F.col("doc_id"), F.col("source"), rates, default_rate=0.0
    )
    n = out.count()
    assert abs(n - 10100) / 10100 < 0.05
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # sqrt weighting: small goes from 1% of rows to ~9%
    assert per["small"] / n > 0.05


def test_temperature_rates_partition_independent(spark):
    from det_module_spark.operators.sampling import (
        apply_mixture,
        temperature_rates,
    )

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    rates = temperature_rates({"s0": 1000, "s1": 1000, "s2": 1000}, 3000)
    a = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(1)
    b = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(17)
    ra = sorted(map(tuple, apply_mixture(a, F.col("doc_id"), F.col("source"), rates).collect()))
    rb = sorted(map(tuple, apply_mixture(b, F.col("doc_id"), F.col("source"), rates).collect()))
    assert ra == rb


def test_shard_plan_packing(spark):
    from det_module_spark.operators.layout import shard_plan

    rows = [(f"g{i % 2}", i, 10 + (i * 7) % 30) for i in range(400)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = shard_plan(df, "n_chars", "doc_id", 200, by=["source"]).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    max_row = max(r[2] for r in rows)
    for g, shards in by_group.items():
        shards.sort(key=lambda r: r["shard"])
        # shard ids strictly increase starting at 0 (gaps allowed only
        # when a single row exceeds the target — not the case here)
        assert shards[0]["shard"] == 0
        assert all(
            b["shard"] > a["shard"] for a, b in zip(shards, shards[1:])
        )
        # a shard never grows beyond target + one overshooting row
        for s in shards:
            assert s["shard_bytes"] <= 200 + max_row
        # key ranges don't overlap across consecutive shards
        for a, b in zip(shards, shards[1:]):
            assert a["last_key"] < b["first_key"]
    # total bytes conserved
    assert sum(r["shard_bytes"] for r in out) == sum(r[2] for r in rows)


def test_shard_plan_partition_independent(spark):
    from det_module_spark.operators.layout import shard_plan

    rows = [(f"g{i % 3}", i, 5 + i % 11) for i in range(300)]
    a = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"]).repartition(1)
    b = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"]).repartition(13)
    ra = sorted(map(tuple, shard_plan(a, "n_chars", "doc_id", 100, by=["source"]).collect()))
    rb = sorted(map(tuple, shard_plan(b, "n_chars", "doc_id", 100, by=["source"]).collect()))
    assert ra == rb


def test_sample_k_per_group(spark):
    from det_module_spark.operators.sampling import sample_k_per_group

    rows = [(i, f"g{i % 4}") for i in range(200)] + [(9999, "tiny")]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = sample_k_per_group(df, F.col("id"), by=["g"], k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["g"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert {g: len(v) for g, v in per.items()} == {
        "g0": 5, "g1": 5, "g2": 5, "g3": 5, "tiny": 1,
    }
    # partition independence
    a = sample_k_per_group(df.repartition(1), F.col("id"), by=["g"], k=5)
    b = sample_k_per_group(df.repartition(7), F.col("id"), by=["g"], k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmv_set_estimates_exact_when_small(spark):
    from det_module_spark.operators.sketch import kmv_set_estimates

    a = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(5, 20)], ["v"])
    r = kmv_set_estimates(a, b, F.col("v"), F.col("v"), k=64).collect()[0]
    # sketches exhaustive below k: both answers exact
    assert r["est_union"] == 20
    assert r["est_intersection"] == 5


def test_kmv_set_estimates_reasonable(spark):
    from det_module_spark.operators.sketch import kmv_set_estimates

    a = spark.createDataFrame([(i,) for i in range(4000)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(2000, 6000)], ["v"])
    r = kmv_set_estimates(a, b, F.col("v"), F.col("v"), k=128).collect()[0]
    assert abs(r["est_union"] - 6000) / 6000 < 0.3
    assert abs(r["est_intersection"] - 2000) / 2000 < 0.6


def test_cluster_representatives_null_scores_lose(spark):
    """A NULL quality score must never crown the representative
    (struct-min would otherwise sort NULL first); a fully unscored
    cluster still gets a representative with a null score."""
    from det_module_spark.operators.graph import cluster_representatives

    pairs = spark.createDataFrame([(1, 2), (5, 6)], ["id_a", "id_b"])
    quality = spark.createDataFrame(
        [(1, None), (2, 10), (5, None), (6, None)],
        "id long, score long",
    )
    out = {
        r["cluster"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
        for r in cluster_representatives(pairs, quality).collect()
    }
    # scored member wins over the null-scored one
    assert out[1] == (2, 10, 2)
    # all-null cluster: lowest id, null score
    assert out[5] == (5, None, 2)
