"""BPE merge-rank fit: classic-algorithm agreement + merge semantics."""

from pyspark.sql import functions as F


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation: the classic sequential BPE fit
    (overlapping pair counts, leftmost non-overlapping merge,
    (count desc, left asc, right asc) tie-break)."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_matches_reference(spark):
    from det_module_spark.operators.bpe import bpe_merges

    words = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "aaaa": 4, "banana": 2,
    }
    rows = [(i, " ".join([w] * f)) for i, (w, f) in enumerate(words.items())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(df, n_merges=6, max_words=None)
        .orderBy("round")
        .collect()
    ]
    want, _ = _ref_bpe(words, 6)
    assert got == want


def test_bpe_overlap_leftmost(spark):
    """'aaaa' with merge (a,a): leftmost non-overlap gives two 'aa'
    symbols, and (a,a) counts 3 overlapping pairs pre-merge."""
    from det_module_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([(0, "aaaa")], ["doc_id", "text"])
    rows = bpe_merges(df, n_merges=2, max_words=None).orderBy("round").collect()
    assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_count"]) == (
        "a", "a", 3,
    )
    # round 2 merges the two adjacent 'aa' symbols
    assert (rows[1]["left"], rows[1]["right"]) == ("aa", "aa")


def test_bpe_encode_counts(spark):
    from det_module_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(0, "banana")], ["doc_id", "text"])
    out0 = bpe_encode(df, [])
    assert out0.collect()[0]["n_subwords"] == 6
    out = bpe_encode(df, [("a", "n"), ("b", "an")])
    # b a n a n a -> b an an a -> ban an a
    assert out.collect()[0]["n_subwords"] == 3
