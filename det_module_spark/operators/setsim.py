"""Exact set-similarity join via prefix filtering (PPJoin-style).

Third leg of the dedup stool (SURVEY.md §2 north star): MinHash-LSH is
probabilistic, the all-pairs shingle join is the quadratic verifier —
prefix filtering gives EXACT Jaccard-threshold pairs with a candidate
set that is provably complete and usually tiny.

Theorem (prefix filter): order every document's distinct tokens by a
single global total order (here: ascending document frequency, rarest
first, ties by token string). If J(A,B) >= t, then the first
p = |s| − ceil(t·|s|) + 1 tokens of each set (its "prefix") must share
at least one token. Equi-joining on prefix tokens therefore yields a
complete candidate set; candidates are verified with the exact
intersection size.

Scale shape: the global order comes from one vocabulary-sized
aggregation (document frequencies — broadcastable); prefixes put the
RAREST tokens in the join key, so candidate buckets are naturally
small exactly where a naive token join explodes (stop-words never
enter a prefix unless a doc is near-all stopwords). Verification
joins candidates back to sorted token arrays and intersects JVM-side
(array_intersect) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from det_module_spark.operators.text import tokens, word_shingles


def _token_sets(df: DataFrame, id_col: str, text: str, n: int) -> DataFrame:
    """Distinct set elements per doc: word n-gram shingles (n > 1) or
    plain tokens (n = 1)."""
    if n > 1:
        return word_shingles(df, id_col, text, n).select(
            F.col(id_col).alias("id"), F.col("shingle").alias("tok")
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(tokens(F.col(text)))).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) of documents whose distinct-token-set
    Jaccard similarity >= ``threshold``:
    → (id_a, id_b, inter, union_sz, jaccard). Exact — same contract as
    the quadratic all-pairs join, different cost curve.

    Set elements are 60-bit stable hashes of the shingles (8-byte join
    keys and arrays instead of 30-byte strings), and the candidate
    join applies BOTH PPJoin filters inside the join condition:
    - size filter: J >= t forces t·|B| <= |A| <= |B|/t;
    - positional filter: a match at prefix ranks (i, j) bounds the
      overlap by 1 + min(|A|−i, |B|−j), which must reach the overlap
      threshold α = ceil(t/(1+t)·(|A|+|B|)).
    Both prune BEFORE the pair multiset materializes — on dense
    corpora (small vocabularies) this is the difference between the
    candidate join exploding and staying near-linear."""
    from det_module_spark.operators.dedup import stable_hash64

    # three consumers (frequencies, ranked prefixes, verification
    # sets): materialize the hashed shingle explosion once
    toks = (
        _token_sets(df, id_col, text, n)
        .select("id", stable_hash64(F.col("tok")).alias("tok"))
        .localCheckpoint(eager=False)
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    # global rarity order; (df, tok) is a total order so every engine
    # and partitioning agrees on each document's prefix. dfreq is
    # vocabulary-sized (corpus-derived, unbounded at 100 TB) so it is
    # NOT broadcast-hinted — AQE broadcasts it while it is small and
    # falls back to a shuffle join when it isn't.
    ranked = toks.join(dfreq, "tok").select(
        "id", "tok", "df_"
    )
    w = Window.partitionBy("id").orderBy(F.asc("df_"), F.asc("tok"))
    sized = (
        ranked.withColumn("rnk", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("id")))
    )
    # prefix length p = sz - ceil(t*sz) + 1. Every ceil/compare gets a
    # 1e-9 slack: binary arithmetic can land a hair ABOVE an exact
    # integer bound (e.g. t/(1+t)·(7+7) = 4.0000000000000018 for
    # t=0.4), and over-pruning loses exactly-at-threshold pairs —
    # the slack only weakens pruning, never completeness.
    eps = F.lit(1e-9)
    p = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - eps) + 1
    prefix = sized.filter(F.col("rnk") <= p).select("id", "tok", "sz", "rnk")
    t = F.lit(threshold)
    alpha = F.ceil(
        t / (F.lit(1.0) + t)
        * (F.col("a.sz") + F.col("b.sz")).cast("double")
        - eps
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            # size filter
            & (F.col("b.sz").cast("double") * t - eps <= F.col("a.sz"))
            & (F.col("a.sz").cast("double") * t - eps <= F.col("b.sz"))
            # positional filter
            & (
                F.lit(1)
                + F.least(
                    F.col("a.sz") - F.col("a.rnk"),
                    F.col("b.sz") - F.col("b.rnk"),
                )
                >= alpha
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .distinct()
    )
    # verify with exact intersection over sorted hash arrays
    sets = toks.groupBy("id").agg(
        F.array_sort(F.collect_list("tok")).alias("toks")
    )
    out = (
        cand.join(
            sets.select(F.col("id").alias("id_a"), F.col("toks").alias("ta")),
            "id_a",
        )
        .join(
            sets.select(F.col("id").alias("id_b"), F.col("toks").alias("tb")),
            "id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("ta"), F.col("tb")))
        )
        .withColumn(
            "union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter")
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / F.col("union_sz").cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "union_sz", "jaccard")


def jaccard_allpairs_bruteforce(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Quadratic token-join verifier with the same output contract —
    test oracle proving the prefix filter loses no pair."""
    from det_module_spark.operators.dedup import stable_hash64

    toks = _token_sets(df, id_col, text, n).select(
        "id", stable_hash64(F.col("tok")).alias("tok")
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # ``sizes`` is one row per document — corpus-sized, so no forced
    # broadcast (AQE decides; this path is the test oracle anyway).
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / F.col("union_sz").cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )
