"""Round-5 operator units: cross-corpus line dedup, Naive Bayes
classification, perceptual (average-hash) near-dup."""

import math

import pytest
from pyspark.sql import functions as F

from det_module_spark.operators.linededup import (
    line_dedup,
    split_fixed_lines,
)
from det_module_spark.operators.multimodal import (
    ahash64,
    ahash_near_dup_pairs,
    sample_pixels,
)
from det_module_spark.operators.nbayes import nb_classify, nb_fit


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_fixed_lines_windows_and_tail(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "x y"), (3, None)])
    out = {
        (r.doc_id, r.idx): r.line
        for r in split_fixed_lines(df, words_per_line=2).collect()
    }
    assert out == {
        (1, 0): "a b",
        (1, 1): "c d",
        (1, 2): "e",
        (2, 0): "x y",
    }  # null text dropped, short tail kept


def test_line_dedup_drop_all_and_doc_retention(spark):
    # "b b" appears in docs 1, 2, 3 -> boilerplate at min_docs=2;
    # doc 3 is ENTIRELY boilerplate and must survive with n_kept=0
    df = _docs(spark, [(1, "a a b b"), (2, "b b c c"), (3, "b b")])
    lines = split_fixed_lines(df, words_per_line=2)
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
        for r in line_dedup(lines, min_docs=2, policy="drop_all").collect()
    }
    assert got == {
        1: (2, 1, "a a"),
        2: (2, 1, "c c"),
        3: (1, 0, ""),
    }


def test_line_dedup_keep_first_keeps_global_first(spark):
    df = _docs(spark, [(1, "a a b b"), (2, "b b c c"), (3, "b b")])
    lines = split_fixed_lines(df, words_per_line=2)
    got = {
        r.doc_id: (r.n_kept, r.clean_text)
        for r in line_dedup(
            lines, min_docs=2, policy="keep_first"
        ).collect()
    }
    # first occurrence of "b b" is (doc 1, idx 1) -> doc 1 keeps it
    assert got == {1: (2, "a a b b"), 2: (1, "c c"), 3: (0, "")}


def test_line_dedup_rejects_unknown_policy(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="policy"):
        line_dedup(split_fixed_lines(df), policy="nope")


# ---------------------------------------------------------------------------
# Naive Bayes
# ---------------------------------------------------------------------------


def test_nb_classify_matches_hand_computation(spark):
    train = spark.createDataFrame(
        [
            ("spam", "buy pills now"),
            ("spam", "buy now"),
            ("ham", "meeting notes today"),
        ],
        "label string, text string",
    )
    test = spark.createDataFrame(
        [(1, "buy pills"), (2, "meeting today")], "doc_id long, text string"
    )
    ts, cs = nb_fit(train, "label", "text")
    got = {r.doc_id: r.pred for r in nb_classify(test, ts, cs).collect()}
    assert got == {1: "spam", 2: "ham"}

    # scoreq for doc 1 under 'spam', hand-computed with the same
    # quantization: priorq = lnq(2) - lnq(3);
    # counts: buy=2, pills=1 -> lnq(3) + lnq(2); V = 6 distinct
    # train terms, tot_spam = 5 -> penalty = lnq(11) * 2 tokens
    def lnq(x):
        return math.floor(math.log(x) * 1e9 + 0.5)

    want = (lnq(2) - lnq(3)) + lnq(3) + lnq(2) - 2 * lnq(5 + 6)
    spam_rows = [
        r
        for r in nb_classify(test, ts, cs).collect()
        if r.doc_id == 1
    ]
    assert spam_rows[0].scoreq == want


def test_nb_classify_tie_breaks_to_largest_label(spark):
    # symmetric corpus: both classes give identical scores to "z z"
    train = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "label string, text string"
    )
    test = spark.createDataFrame([(1, "q")], "doc_id long, text string")
    ts, cs = nb_fit(train, "label", "text")
    assert nb_classify(test, ts, cs).collect()[0].pred == "b"


def test_nb_score_unseen_vocabulary_doc_gets_smoothed_score(spark):
    # doc sharing no vocabulary with training: sumq = 0 path
    train = spark.createDataFrame(
        [("a", "x x"), ("b", "y")], "label string, text string"
    )
    test = spark.createDataFrame([(7, "zz ww")], "doc_id long, text string")
    ts, cs = nb_fit(train, "label", "text")
    rows = nb_classify(test, ts, cs).collect()
    assert len(rows) == 1  # still classified

    def lnq(x):
        return math.floor(math.log(x) * 1e9 + 0.5)

    # class 'a': prior ln(1/2), 2 tokens, tot_a=2, V=2 -> -2*lnq(4)
    # class 'b': prior ln(1/2), tot_b=1, V=2 -> -2*lnq(3) (larger)
    assert rows[0].pred == "b"
    assert rows[0].scoreq == (lnq(1) - lnq(2)) - 2 * lnq(3)


# ---------------------------------------------------------------------------
# perceptual hash
# ---------------------------------------------------------------------------


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "media_id long, content binary"
    )


def test_ahash_identical_blobs_collide_at_distance_zero(spark):
    blob = bytes(range(100, 200)) * 2
    m = _media(spark, [(1, blob), (2, blob), (3, bytes(64))])
    pairs = ahash_near_dup_pairs(
        ahash64(sample_pixels(m)), max_hamming=7
    ).collect()
    assert [(p.media_a, p.media_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_ahash_hash_is_mean_threshold_bits(spark):
    # 64-byte blob: sample_pixels is identity; first 32 bytes low,
    # last 32 high -> hi half all zeros, lo half all ones
    blob = bytes([0] * 32 + [200] * 32)
    m = _media(spark, [(1, blob)])
    h = ahash64(sample_pixels(m)).collect()[0]
    assert h.hi == 0
    assert h.lo == 2**32 - 1


def test_ahash_banding_is_complete_at_radius_7(spark):
    # adversarial near-dup at the radius boundary: flip exactly 7
    # hash bits (spread over 5 bands) — banding must still find the
    # pair via any untouched band (here bands 2, 3, 7)
    base = bytes([10] * 32 + [200] * 32)
    tweaked = bytearray(base)
    # hi bits 0,4,8,12 (bands 0,1) + lo bits 0,8,16 (bands 4,5,6);
    # the flips also shift the mean, but every pixel stays on the
    # same side of it except the 7 flipped ones -> Hamming exactly 7
    for pos in (0, 4, 8, 12, 32, 40, 48):
        tweaked[pos] = 255 if base[pos] == 10 else 10
    m = _media(spark, [(1, base), (2, bytes(tweaked))])
    hashes = ahash64(sample_pixels(m))
    pairs = ahash_near_dup_pairs(hashes, max_hamming=7).collect()
    assert len(pairs) == 1
    assert pairs[0].hamming == 7


def test_ahash_rejects_incomplete_radius(spark):
    m = _media(spark, [(1, bytes(64))])
    with pytest.raises(ValueError, match="max_hamming"):
        ahash_near_dup_pairs(ahash64(sample_pixels(m)), max_hamming=8)


def test_ahash_matches_oracle_formula_on_corpus(spark, sf_dir):
    # brute-force equivalence: banded pairs == all-pairs filter at
    # radius 7 over the real corpus blobs
    from det_module_spark.operators.multimodal import media_from_documents
    from det_module_spark.sources.tables import load_table

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    hashes = ahash64(sample_pixels(media)).cache()
    banded = {
        (r.media_a, r.media_b, r.hamming)
        for r in ahash_near_dup_pairs(hashes, max_hamming=7).collect()
    }
    a = hashes.select(
        F.col("media_id").alias("ma"),
        F.col("hi").alias("ha"),
        F.col("lo").alias("la"),
    )
    b = hashes.select(
        F.col("media_id").alias("mb"),
        F.col("hi").alias("hb"),
        F.col("lo").alias("lb"),
    )
    brute = {
        (r.ma, r.mb, r.d)
        for r in a.join(b, F.col("ma") < F.col("mb"))
        .select(
            "ma",
            "mb",
            (
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            )
            .cast("long")
            .alias("d"),
        )
        .filter(F.col("d") <= 7)
        .collect()
    }
    hashes.unpersist()
    assert banded == brute


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def _lnqi(x):
    return math.floor(math.log(x) * 1e9 + 0.5)


def test_dsir_weights_hand_computed(spark):
    from det_module_spark.operators.importance import dsir_weights

    target = spark.createDataFrame([("a a",)], "text string")
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "b b")], "doc_id long, text string"
    )
    w = {r.doc_id: (r.n_toks, r.weightq) for r in dsir_weights(target, raw).collect()}
    # models: c_T = {a:2}, c_R = {a:1, b:3}; V = 2, tot_T = 2, tot_R = 4
    # delta(a) = lnq(3) - lnq(2); delta(b) = lnq(1) - lnq(4) = -lnq(4)
    # penalty = lnq(4) - lnq(6)
    pen = _lnqi(4) - _lnqi(6)
    want1 = (_lnqi(3) - _lnqi(2)) - _lnqi(4) - 2 * pen
    want2 = -2 * _lnqi(4) - 2 * pen
    assert w == {1: (2, want1), 2: (2, want2)}
    assert w[1][1] > w[2][1]  # doc 1 is more target-like


def test_dsir_select_threshold_and_ties(spark):
    from det_module_spark.operators.importance import dsir_select

    w = spark.createDataFrame(
        [(1, 5, 100), (2, 5, 90), (3, 5, 90), (4, 5, 10)],
        "doc_id long, n_toks long, weightq long",
    )
    got = {r.doc_id: r.selected for r in dsir_select(w, k=2).collect()}
    # k=2 threshold lands on 90; BOTH ties at 90 selected
    assert got == {1: True, 2: True, 3: True, 4: False}


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_scores_ordering_and_exactness(spark):
    from det_module_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "x x x y"),       # heavy in x, short
            (2, "x z z z z z z z"),  # one x, long
            (3, "y z"),           # no x
            (4, "y y"),
            (5, "z y"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_hits, r.scoreq) for r in bm25_scores(docs, ["x"]).collect()}
    assert set(out) == {1, 2}  # only docs containing a query term
    # x is rare (df 2 of 5 -> positive idf); doc 1 has higher tf and
    # shorter length -> strictly higher score
    assert out[1][1] > out[2][1] > 0
    assert out[1][0] == out[2][0] == 1
    # exact check for doc 1: N=5, T=18, df(x)=2, c=3, L=4
    idfq = _lnqi(2 * 5 - 2 * 2 + 1) - _lnqi(2 * 2 + 1)
    ratio = (44 * 3 * 18 * 10**4) // (20 * 3 * 18 + 6 * 18 + 18 * 5 * 4)
    assert out[1][1] == idfq * ratio


def test_bm25_rejects_empty_query(spark):
    import pytest as _pytest

    from det_module_spark.operators.text import bm25_scores

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="query_terms"):
        bm25_scores(docs, [])


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_separates_obvious_clusters(spark):
    from det_module_spark.operators.kmeans import kmeans_fit_predict

    # two tight blobs around (0.5, 0.5) and (-0.5, -0.5); seeds are
    # vec 0 (blob A) and vec 1 (blob B)
    rows = [
        (0, [0.5, 0.5]),
        (1, [-0.5, -0.5]),
        (2, [0.52, 0.48]),
        (3, [-0.49, -0.51]),
        (4, [0.47, 0.53]),
        (5, [-0.53, -0.47]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.cid for r in kmeans_fit_predict(df, k=2, iters=2).collect()}
    assert out == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from det_module_spark.operators.kmeans import kmeans_fit_predict

    # seed 1 sits far away with nothing near it after round 1 moves
    # seed 0's centroid; all points still get assignments and exactly
    # the two seeded cluster ids appear in output domain
    rows = [(0, [0.0]), (1, [0.9]), (2, [0.05]), (3, [0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_fit_predict(df, k=2, iters=3).collect()
    assert len(out) == 4
    assert {r.cid for r in out} <= {0, 1}
    assert all(r.distq >= 0 for r in out)


def test_kmeans_matches_sql_oracle_on_fixture(spark, sf_dir):
    import duckdb

    from det_module_spark.operators.kmeans import (
        kmeans_fit_predict,
        kmeans_sql,
    )
    from det_module_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r.vec_id, r.cid, r.distq)
        for r in kmeans_fit_predict(emb, k=4, iters=1).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.sql(kmeans_sql(k=4, iters=1)).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# grouped-aggregate retraction IVM
# ---------------------------------------------------------------------------


def test_agg_delta_retract_equals_recompute(spark):
    from det_module_spark.operators.incremental import agg_delta_retract

    hist = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "k string, v long"
    )
    state = hist.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_value"),
    )
    # delete one 'a' copy, delete BOTH c rows via weight -1... c has
    # one row; also a double-insert for d (weight 2)
    delta = spark.createDataFrame(
        [("a", 10, -1), ("c", 7, -1), ("d", 3, 2), ("b", 1, 1)],
        "k string, v long, _w long",
    )
    got = {
        r.k: (r.n_rows, r.sum_value)
        for r in agg_delta_retract(state, delta, ["k"], "v").collect()
    }
    # recompute: a={20}, b={5,1}, c gone, d={3,3}
    assert got == {"a": (1, 20), "b": (2, 6), "d": (2, 6)}


def test_agg_delta_retract_delta_only_group_and_noop(spark):
    from det_module_spark.operators.incremental import agg_delta_retract

    state = spark.createDataFrame(
        [("x", 1, 100)], "k string, n_rows long, sum_value long"
    )
    # net-zero delta on a NEW group must not materialize it
    delta = spark.createDataFrame(
        [("y", 9, 1), ("y", 9, -1)], "k string, v long, _w long"
    )
    got = agg_delta_retract(state, delta, ["k"], "v").collect()
    assert [(r.k, r.n_rows, r.sum_value) for r in got] == [("x", 1, 100)]
