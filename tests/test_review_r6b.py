"""Regression pins for the round-6 second code-review pass.

Ten latents, all edge-input-only (none reachable from the driver
tables, verified by data probes at every SF — registered-query values
are byte-identical): ANSI-mode crashes on zero-norm embeddings and
short documents, NULL-key equi-joins silently dropping rows
(dictionary_encode / chi-square / MI / t-closeness / fd_violations),
an unanchored URL query regex promoting fragment content, missing
Benford digits, and opaque empty-fit-sample errors.
"""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- #
# 1. zero-norm embeddings: cosine is NULL, never a DIVIDE_BY_ZERO   #
# ---------------------------------------------------------------- #

def _vec_df(spark, extra_rows=()):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ] + list(extra_rows)
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_zero_norm_vector_excluded_from_cosine_topk(spark):
    from det_module_spark.operators.similarity import cosine_topk

    df = _vec_df(spark, [(9, [0.0, 0.0, 0.0, 0.0])])
    got = cosine_topk(df, df, k=10).collect()  # k > candidates
    assert got, "cosine_topk returned nothing"
    assert all(r["query_id"] != 9 and r["neighbor_id"] != 9 for r in got)
    assert all(r["cos"] is not None for r in got)
    # the non-zero rows still rank identically to a zero-free corpus
    clean = cosine_topk(_vec_df(spark), _vec_df(spark), k=10).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, got)) == sorted(map(key, clean))


def test_zero_norm_vector_semantic_dedup_and_pairs(spark):
    from det_module_spark.operators.dedup import embedding_near_dup_pairs
    from det_module_spark.operators.similarity import semantic_dedup

    # two zero vectors: not each other's duplicates (cos undefined →
    # NULL → below every threshold), and no crash anywhere
    df = _vec_df(
        spark, [(8, [0.0] * 4), (9, [0.0] * 4)]
    )
    kept = semantic_dedup(df, n_cells=2, threshold=0.95)
    assert {r["vec_id"] for r in kept.collect()} >= {8, 9}

    pairs = embedding_near_dup_pairs(df, threshold=0.0).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 8 not in ids_in_pairs and 9 not in ids_in_pairs
    assert all(r["cos"] is not None for r in pairs)


def test_fit_sample_empty_raises_value_error(spark):
    from det_module_spark.operators.similarity import (
        ivf_fit_centroids,
        pq_fit,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="fit sample is empty"):
        ivf_fit_centroids(df, k=2)
    with pytest.raises(ValueError, match="fit sample is empty"):
        pq_fit(df, m=2, k=2, dim=4)


# ---------------------------------------------------------------- #
# 2. short documents: shingles degrade, never ANSI-crash            #
# ---------------------------------------------------------------- #

def test_word_shingles_short_doc_degrades_to_short_gram(spark):
    from det_module_spark.operators.text import word_shingles

    df = spark.createDataFrame(
        [(1, "hello"), (2, "two words"), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = word_shingles(df, n=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert by_doc[1] == {"hello"}          # the documented short gram
    assert by_doc[2] == {"two words"}
    assert by_doc[3] == {"a b c", "b c d"}  # ≥n docs byte-identical


def test_repetition_features_short_doc_no_crash(spark):
    from det_module_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [(1, "hello"), (2, "spam spam spam spam spam spam")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(df, n=3).collect()}
    assert got[1]["dup_gram_frac"] == 0.0   # one gram, no repeats
    assert got[2]["dup_gram_frac"] > 0.5    # looping text still flagged


# ---------------------------------------------------------------- #
# 3-7, 9-10. NULL-key joins, Benford spine, URL fragment            #
# ---------------------------------------------------------------- #

def test_dictionary_encode_keeps_null_rows(spark):
    from det_module_spark.operators.quality import dictionary_encode

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, v string"
    )
    dictionary, encoded = dictionary_encode(df, "v")
    d = {r["v"]: r["code"] for r in dictionary.collect()}
    assert d == {None: 1, "a": 2, "b": 3}   # NULL sorts first
    e = {r["id"]: r["code"] for r in encoded.collect()}
    assert e == {1: 2, 2: 1, 3: 3}          # no row dropped


def test_fd_violations_counts_null_as_a_state(spark):
    from det_module_spark.operators.quality import fd_violations

    df = spark.createDataFrame(
        [("k1", "a"), ("k1", None), ("k2", "b"), ("k3", None)],
        "k string, v string",
    )
    got = {r["k"]: r["n_rhs_values"] for r in
           fd_violations(df, ["k"], "v").collect()}
    assert got == {"k1": 2}   # {a, NULL} violates; all-NULL k3 passes


def test_chi_square_and_mi_include_null_category_cells(spark):
    from det_module_spark.operators.quality import (
        chi_square_independence,
        mutual_information,
    )

    rows = [("x", "p"), (None, "p"), ("y", "q"), ("y", "p")]
    df = spark.createDataFrame(rows, "a string, b string")

    out = chi_square_independence(df, "a", "b").collect()
    cells = [r for r in out if r["dof"] is None]
    total = [r for r in out if r["dof"] is not None][0]
    assert len(cells) == 4                       # incl. the NULL cell
    assert sum(r["observed"] for r in cells) == 4
    assert total["observed"] == 4
    # hand-computed: N=4, r_tot={x:1, NULL:1, y:2}, c_tot={p:3, q:1};
    # the NULL cell contributes e=1·3/4=0.75, χ²=(4−3)²/(3·4)=1/12
    by_cell = {(r["a"], r["b"]): r for r in cells}
    assert by_cell[(None, "p")]["expected_q"] == 750000
    assert by_cell[(None, "p")]["contrib_q"] == 83333
    assert total["contrib_q"] == 83333 + 83333 + 500000 + 166667
    assert total["dof"] == (3 - 1) * (2 - 1)     # NULL is a level

    # MI is invariant under relabeling: NULL behaves as just another
    # level, so replacing it with a fresh sentinel must not change it
    mi_null = mutual_information(df, "a", "b").collect()[0]
    df2 = df.withColumn("a", F.coalesce(F.col("a"), F.lit("<sentinel>")))
    mi_sent = mutual_information(df2, "a", "b").collect()[0]
    assert mi_null["n"] == mi_sent["n"] == 4
    assert mi_null["mi_num_q"] == mi_sent["mi_num_q"]


def test_t_closeness_null_quasi_group_not_spuriously_flagged(spark):
    from det_module_spark.operators.privacy import t_closeness_report

    # both groups mirror the table distribution exactly → EMD 0
    rows = [("z1", 1), ("z1", 2), (None, 1), (None, 2)]
    df = spark.createDataFrame(rows, "zip string, lvl int")
    got = {r["zip"]: r for r in
           t_closeness_report(df, ["zip"], F.col("lvl")).collect()}
    assert got["z1"]["emd_ppm"] == 0 and not got["z1"]["is_risky"]
    assert got[None]["emd_ppm"] == 0 and not got[None]["is_risky"]


def test_benford_audit_emits_all_nine_digits(spark):
    from det_module_spark.operators.quality import benford_audit

    df = spark.createDataFrame(
        [(1.2,), (1.5,), (2.3,)], "v double"
    )
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert sorted(got) == list(range(1, 10))
    assert got[1]["n"] == 2 and got[2]["n"] == 1
    for d in range(3, 10):
        assert got[d]["n"] == 0
        assert got[d]["observed_p"] == 0.0
        assert got[d]["chi2_term"] > 0   # absent digits still penalize

    empty = benford_audit(df.filter("v < 0"), "v").collect()
    assert len(empty) == 9               # no ANSI 0/0 abort
    assert all(r["observed_p"] == 0.0 for r in empty)


def test_normalize_urls_fragment_question_mark_not_query(spark):
    from det_module_spark.operators.web import normalize_urls

    df = spark.createDataFrame(
        [
            (1, "http://Ex.com/p#frag?utm_source=z&x=1"),
            (2, "http://ex.com/p?b=2&a=1#frag"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r for r in normalize_urls(df).collect()}
    # a '?' inside the fragment is fragment content, not a query
    assert got[1]["query"] == ""
    assert got[1]["canonical"] == "http://ex.com/p"
    # a real query before the fragment still canonicalizes
    assert got[2]["query"] == "a=1&b=2"
    assert got[2]["canonical"] == "http://ex.com/p?a=1&b=2"
