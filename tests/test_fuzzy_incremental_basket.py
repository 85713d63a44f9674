"""Tests for the round-2 operator batch: fuzzy edit-distance join,
incremental agg maintenance, market-basket affinity, winsorize,
label centroids, bigram LM, distinctive terms, JSON shredding."""

import math

from pyspark.sql import functions as F

from det_module_spark.operators.basket import basket_affinity, pair_counts
from det_module_spark.operators.cleaning import winsorize
from det_module_spark.operators.fuzzyjoin import (
    edit1_pairs,
    edit1_pairs_bruteforce,
)
from det_module_spark.operators.incremental import merge_agg_state, partial_agg
from det_module_spark.operators.semistructured import shred_json
from det_module_spark.operators.similarity import label_centroids
from det_module_spark.operators.text import bigram_next_words, distinctive_terms


# ---------------------------------------------------------------- fuzzy join
def test_edit1_banding_is_lossless(spark):
    # substitutions, insertions, deletions, exact dups, transpositions
    # (transpositions are distance 2 and must be refined OUT)
    rows = [
        (1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "kitte"),
        (5, "kittten"), (6, "ab"), (7, "ba"), (8, "kitten"),
        (9, "x"), (10, ""), (11, "axb"), (12, "ayb"), (13, "ab"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    fast = sorted(map(tuple, edit1_pairs(df).collect()))
    slow = sorted(map(tuple, edit1_pairs_bruteforce(df).collect()))
    assert fast == slow
    assert (1, 8, 0) in fast          # exact duplicate pair
    assert not any(p[:2] == (6, 7) for p in fast)  # transposition refined out


def test_edit1_empty_and_single_char(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "b"), (4, "ab")], "id int, name string"
    )
    got = sorted(map(tuple, edit1_pairs(df).collect()))
    want = sorted(map(tuple, edit1_pairs_bruteforce(df).collect()))
    assert got == want
    assert (1, 2, 1) in got  # "" vs "a" is one insertion


# ------------------------------------------------------------- incremental
def test_incremental_merge_equals_full_recompute(spark):
    full = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 5), ("b", 4, 7), ("c", 5, 1)],
        "k string, id int, v long",
    )
    spec = dict(
        sum_cols={"sum_v": "v"}, min_cols={"min_v": "v"}, max_cols={"max_v": "v"}
    )
    state = partial_agg(full.filter(F.col("id") <= 3), ["k"], **spec)
    delta = partial_agg(full.filter(F.col("id") > 3), ["k"], **spec)
    merged = merge_agg_state(
        state, delta, ["k"], ["sum_v"], ["min_v"], ["max_v"]
    )
    direct = partial_agg(full, ["k"], **spec)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_incremental_merge_one_sided_groups(spark):
    spec = dict(sum_cols={"sum_v": "v"})
    s = partial_agg(
        spark.createDataFrame([("a", 1)], "k string, v long"), ["k"], **spec
    )
    d = partial_agg(
        spark.createDataFrame([("b", 9)], "k string, v long"), ["k"], **spec
    )
    merged = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in merge_agg_state(s, d, ["k"], ["sum_v"]).collect()
    }
    assert merged == {"a": (1, 1), "b": (1, 9)}


# ------------------------------------------------------------------ basket
def test_pair_counts_and_lift(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "z"), (4, "z"),  # duplicate item in basket counts once
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    pairs = {
        (r["item_a"], r["item_b"]): r["pair_count"]
        for r in pair_counts(df, "basket", "item", min_support=2).collect()
    }
    assert pairs == {("x", "y"): 3}
    aff = basket_affinity(df, "basket", "item", min_support=2).collect()[0]
    # lift = n_baskets * pair / (count_x * count_y) = 4*3/(3*3)
    assert aff["lift"] == round(4 * 3 / 9, 6)


def test_basket_mega_basket_guard(spark):
    rows = [(1, f"i{i}") for i in range(50)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = pair_counts(df, "basket", "item", min_support=1, max_basket_size=10)
    assert {(r["item_a"], r["item_b"]) for r in got.collect()} == {("i0", "i1")}


# --------------------------------------------------------------- winsorize
def test_winsorize_clips_to_interpolated_percentiles(spark):
    vals = list(range(1, 11))  # 1..10
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v long"
    )
    out = winsorize(df, "v", "grp", 0.1, 0.9).collect()
    # p10 = 1 + 0.9 = 1.9 -> rounds to 2; p90 = 9.1 -> rounds to 9
    wins = sorted(r["v_wins"] for r in out)
    assert wins == [2, 2, 3, 4, 5, 6, 7, 8, 9, 9]
    assert sum(r["clipped_low"] for r in out) == 1
    assert sum(r["clipped_high"] for r in out) == 1


# --------------------------------------------------------- label centroids
def test_label_centroids_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -1.0]), (0, [3.0, 1.0]), (1, [0.5, 0.5])],
        "label int, embedding array<float>",
    )
    got = {
        (r["label"], r["pos"]): (r["n"], r["centroid"], r["variance"])
        for r in label_centroids(df).collect()
    }
    assert got[(0, 0)] == (2, 2.0, 1.0)   # mean(1,3)=2 var=1
    assert got[(0, 1)] == (2, 0.0, 1.0)
    assert got[(1, 0)] == (1, 0.5, 0.0)


# ---------------------------------------------------------------- bigram LM
def test_bigram_next_words(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "a b")], "doc_id int, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["rank"], r["cnt"], r["total"], r["logp"])
        for r in bigram_next_words(df, k=2).collect()
    }
    # bigrams from 'a': a->b x3, a->c x1 (total 4)
    assert got[("a", "b")][:3] == (1, 3, 4)
    assert got[("a", "c")][:3] == (2, 1, 4)
    assert got[("a", "b")][3] == math.floor(math.log(3 / 4) * 1e6 + 0.5) / 1e6
    # 'b' -> 'a' twice (doc 2's trailing b has no successor)
    assert got[("b", "a")][:3] == (1, 2, 2)
    assert got[("b", "a")][3] == 0.0  # ln(1) == 0


# ---------------------------------------------------------- distinctive terms
def test_distinctive_terms_top_term(spark):
    rows = [
        (1, "zebra zebra zebra common", "s1"),
        (2, "zebra zebra common common", "s1"),
        (3, "apple apple common common", "s2"),
        (4, "apple common common apple", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    top = {
        r["source"]: r["term"]
        for r in distinctive_terms(df, "source", k=1).collect()
    }
    assert top == {"s1": "zebra", "s2": "apple"}


# -------------------------------------------------------------- JSON shred
def test_shred_json_types_and_malformed(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, "not json"), (3, None)],
        "id int, props string",
    )
    out = {
        r["id"]: (r["k"], r["tag"])
        for r in shred_json(df, "props", "k LONG, tag STRING").collect()
    }
    assert out[1] == (7, "x")
    assert out[2] == (None, None)
    assert out[3] == (None, None)
    # keep=True retains the raw column
    kept = shred_json(df, "props", "k LONG", keep=True)
    assert "props" in kept.columns


def test_join_delta_equals_full_recompute(spark):
    """(A∪ΔA)⋈(B∪ΔB) == A⋈B ∪ join_delta — the IVM identity."""
    from pyspark.sql import functions as F

    from det_module_spark.operators.incremental import join_delta

    a = spark.createDataFrame([(k, f"a{k}") for k in range(20)], ["k", "va"])
    da = spark.createDataFrame([(k, f"A{k}") for k in range(15, 30)], ["k", "va"])
    b = spark.createDataFrame([(k, k * 10) for k in range(0, 40, 2)], ["k", "vb"])
    db = spark.createDataFrame([(k, k * 100) for k in range(1, 40, 4)], ["k", "vb"])

    full = a.unionByName(da).join(b.unionByName(db), "k")
    incr = a.join(b, "k").unionByName(join_delta(a, da, b, db, on=["k"]))
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, incr.collect())
    )


def test_join_delta_retract_equals_full_recompute(spark):
    """Z-set IVM: applying the netted weighted delta to the old view
    reproduces the new view's multiset exactly, with inserts AND
    deletes (including the delete×delete and duplicate-row cases)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from det_module_spark.operators.incremental import join_delta_retract

    # duplicates in the snapshots make the multiset semantics load-
    # bearing: k=2 appears twice in a, k=4 twice in b
    a_rows = [(k, f"a{k}") for k in range(8)] + [(2, "a2")]
    b_rows = [(k, k * 10) for k in range(0, 12, 2)] + [(4, 40)]
    a = spark.createDataFrame(a_rows, ["k", "va"])
    b = spark.createDataFrame(b_rows, ["k", "vb"])
    # ΔA: insert k=10..13, delete ONE copy of (2,"a2") and (5,"a5");
    # ΔB: insert odd k, delete (4,40) BOTH copies and (2,20)
    da = spark.createDataFrame(
        [(k, f"a{k}", 1) for k in range(10, 14)]
        + [(2, "a2", -1), (5, "a5", -1)],
        ["k", "va", "_w"],
    )
    db = spark.createDataFrame(
        [(k, k * 10, 1) for k in range(1, 12, 2)]
        + [(4, 40, -2), (2, 20, -1)],
        ["k", "vb", "_w"],
    )

    def as_multiset(rows):
        c = Counter()
        for r in rows:
            c[(r["k"], r["va"], r["vb"])] += r["_w"] if "_w" in r else 1
        return {k: v for k, v in c.items() if v != 0}

    # ground truth: materialize new A and new B, join fully.
    # A held (2,'a2') twice; one copy deleted leaves exactly the one
    # in range(8). k=5 deleted outright.
    new_a = [(k, f"a{k}") for k in range(8) if k != 5] + [
        (k, f"a{k}") for k in range(10, 14)
    ]
    new_b = [(k, k * 10) for k in range(0, 12, 2) if k not in (2, 4)] + [
        (k, k * 10) for k in range(1, 12, 2)
    ]
    full_new = spark.createDataFrame(new_a, ["k", "va"]).join(
        spark.createDataFrame(new_b, ["k", "vb"]), "k"
    )
    old = a.join(b, "k").withColumn("_w", F.lit(1))
    delta = join_delta_retract(a, da, b, db, on=["k"])
    applied = as_multiset(old.collect() + delta.collect())
    want = as_multiset(full_new.withColumn("_w", F.lit(1)).collect())
    assert applied == want
    # and the delta itself is netted: no zero-weight rows
    assert all(r["_w"] != 0 for r in delta.collect())
