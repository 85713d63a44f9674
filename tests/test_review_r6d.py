"""Regression pins for the round-6 fourth code-review pass
(dedup/basket/decontaminate/linededup/fuzzyjoin/spandedup).

Edge-input-only again (NULL content keys, NULL lines, empty-text
docs, probe-vs-index id ordering, oversized-basket lift universe,
over-wide sort ids) — no trigger in the driver tables; full parity
re-verified after the diff.
"""

import pytest
from pyspark.sql import functions as F


def test_exact_dedup_null_keys_not_one_group(spark):
    from det_module_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    got = exact_dedup(df, F.md5(F.col("text"))).collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in got}
    # the two null-text docs are NOT merged into a duplicate group
    assert by_keep == {1: 2, 5: 1}


def test_embedding_probe_mode_finds_newer_than_index_pairs(spark):
    from det_module_spark.operators.dedup import embedding_near_dup_pairs

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    # daily-ingest shape: probe ids LARGER than every indexed id
    probe = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = embedding_near_dup_pairs(
        corpus, threshold=0.99, probe=probe, probe_is_disjoint=True
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(100, 1)]
    # without the flag the (new, old) pair is invisible — the subset
    # contract's id_a < id_b predicate applies
    none = embedding_near_dup_pairs(
        corpus, threshold=0.99, probe=probe
    ).collect()
    assert none == []

    # a subset probe dedups unordered pairs exactly once
    sub = embedding_near_dup_pairs(
        corpus.unionByName(probe),
        threshold=-1.0,
        probe=corpus.unionByName(probe),
    ).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in sub) == [
        (1, 2), (1, 100), (2, 100),
    ]

    # self mode still dedups the symmetric pair with id_a < id_b
    self_pairs = embedding_near_dup_pairs(corpus, threshold=-1.0).collect()
    assert [(r["id_a"], r["id_b"]) for r in self_pairs] == [(1, 2)]


def test_basket_affinity_lift_universe_is_consistent(spark):
    from det_module_spark.operators.basket import basket_affinity

    # two normal baskets with {a, b}, plus one oversized basket
    # (> max_basket_size=3) that also contains a and b: the capped
    # universe has a and b always together, so lift must be exactly
    # 1.0 — mixing uncapped supports would understate it
    rows = (
        [("b1", "a"), ("b1", "b"), ("b2", "a"), ("b2", "b")]
        + [("big", f"i{j}") for j in range(4)]
        + [("big", "a"), ("big", "b")]
    )
    df = spark.createDataFrame(rows, "basket string, item string")
    got = basket_affinity(
        df, "basket", "item", min_support=2, max_basket_size=3
    ).collect()
    (r,) = got
    assert (r["item_a"], r["item_b"]) == ("a", "b")
    assert r["pair_count"] == 2 and r["count_a"] == 2 and r["count_b"] == 2
    assert r["lift"] == 1.0


def test_contamination_report_keeps_empty_text_docs(spark):
    from det_module_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    # doc 4 ("   ") is NOT zero-shingle: the split-on-space
    # convention yields empty tokens whose gram is a whitespace
    # shingle — consistent on both engines, so it stays. The
    # zero-shingle docs are empty-string and NULL text.
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           contamination_report(corpus, bench).collect()}
    assert sorted(got) == [1, 2, 3, 4]        # one row per corpus doc
    for d in (2, 3):
        assert got[d]["n_shingles"] == 0
        assert got[d]["overlap_frac"] == 0.0  # no ANSI 0/0 abort
        assert got[d]["contaminated"] is False
    assert got[4]["contaminated"] is False
    assert got[1]["contaminated"] is True

    kept = {r["doc_id"] for r in decontaminate(corpus, bench).collect()}
    assert kept == {2, 3, 4}                  # only the real hit dropped


def test_line_dedup_null_lines_keep_their_document(spark):
    from det_module_spark.operators.linededup import line_dedup

    rows = [
        (1, 0, "keep me"), (1, 1, None),
        (2, 0, None), (2, 1, None),           # entirely NULL lines
        (3, 0, "keep me too"),
    ]
    lines = spark.createDataFrame(rows, "doc_id long, idx int, line string")
    got = {r["doc_id"]: r for r in
           line_dedup(lines, min_docs=2, policy="drop_all").collect()}
    assert sorted(got) == [1, 2, 3]           # doc 2 does not vanish
    assert got[1]["n_lines"] == 2             # the NULL line is counted
    assert got[2]["n_lines"] == 2
    # NULL lines occur in >= 2 docs -> boilerplate -> dropped
    assert got[2]["n_kept"] == 0 and got[2]["clean_text"] == ""
    assert got[1]["n_kept"] == 1 and got[1]["clean_text"] == "keep me"


def test_snb_wide_id_fails_loudly_not_silently(spark):
    from det_module_spark.operators.fuzzyjoin import (
        sorted_neighborhood_pairs,
    )

    ok = spark.createDataFrame(
        [(1, "aa"), (2, "ab"), (3, "zz")], "id long, name string"
    )
    pairs = sorted_neighborhood_pairs(
        ok, "id", "name", window=2, max_distance=1
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    wide = spark.createDataFrame(
        [("a" * 13, "x"), ("b" * 13, "y")], "id string, name string"
    )
    with pytest.raises(Exception, match="12-char sort pad"):
        sorted_neighborhood_pairs(
            wide, "id", "name", window=2
        ).collect()
