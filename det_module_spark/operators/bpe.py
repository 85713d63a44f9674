"""BPE (byte-pair-encoding) merge-rank fitting, distributed.

Learns the top-N BPE merge operations from a corpus — the core of
tokenizer training (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"). The classic algorithm is
sequential; the distributed formulation here exploits the standard
observation that BPE fits on the WORD-TYPE vocabulary, not the
corpus: one ``groupBy(word).count()`` reduces 100 TB of text to a
vocab table (≤ ~1M rows at any corpus size), and every merge round is
a small aggregation over that bounded table. Corpus size only affects
the first count; rounds are corpus-size-independent.

Round r:
1. pair counts: adjacent symbol pairs per word, weighted by word
   frequency (overlapping pairs count, as in the reference
   implementation's ``get_stats``);
2. argmax pair, ties broken (count desc, left asc, right asc) —
   deterministic in any engine;
3. apply the merge to every word's symbol sequence, leftmost
   non-overlapping.

Engine-portable state: a word's symbol sequence is the string
``'|' + join(symbols, '||') + '|'``. Applying merge (a, b) is then
``replace(state, '|a||b|', '|ab|')`` — SQL ``replace`` is leftmost
non-overlapping in Spark and DuckDB alike, and the DOUBLED delimiter
means consuming a match never eats the boundary of the next one
(with single delimiters, ``|a|a|a|a|`` would merge once, not twice).
Pair extraction splits on ``'||'``. Everything is integer counts and
string ops — bit-reproducible by a SQL oracle that replays the same
N rounds.

The per-round argmax is collected to the driver (one single-row
collect per round — control plane, same discipline as the IVF/PQ
fits); the vocab state stays distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: symbol-sequence delimiter; words containing it are excluded from
#: the fit (arbitrary sentinel — any char absent from the token set)
DELIM = "|"


def _initial_state(word: Column) -> Column:
    """chars of ``word`` joined as '|c1||c2||…||ck|'."""
    return F.concat(
        F.lit(DELIM),
        F.array_join(F.split(word, ""), DELIM + DELIM),
        F.lit(DELIM),
    )


def _symbols(state: Column) -> Column:
    """state string → array of symbols (strip the outer delimiters,
    split on the doubled one)."""
    return F.split(
        F.substring(state, 2, F.length(state) - 2), "\\|\\|"
    )


def word_vocab(
    df: DataFrame, text: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, freq) vocabulary — the one corpus-sized aggregation.
    ``max_words`` keeps the fit bounded: top words by (freq desc,
    word asc), a deterministic truncation."""
    words = (
        df.select(F.explode(F.split(F.col(text), " ")).alias("word"))
        .filter((F.length("word") > 0) & (~F.col("word").contains(DELIM)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        words = words.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    return words


def bpe_merges(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 8,
    max_words: int | None = 200,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns one row per
    round: (round, left, right, merged, pair_count), in round order.
    """
    spark = df.sparkSession
    vocab = word_vocab(df, text, max_words).select(
        "word", "freq", _initial_state(F.col("word")).alias("state")
    )
    # the vocab is tiny relative to the corpus — pin it so the N
    # rounds re-read materialized rows instead of re-aggregating the
    # corpus once per round
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        syms = _symbols(F.col("state"))
        # guard single-symbol words: sequence(1, 0) in Spark is the
        # DESCENDING [1, 0], not empty — gate the gram build on >= 2
        # symbols instead
        grams = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("left"),
                    F.element_at(syms, i + 1).alias("right"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        pairs = vocab.select("freq", F.explode(grams).alias("p"))
        best = (
            pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merged = left + right
        merges.append((r, left, right, merged, cnt))
        pat = F.lit(f"{DELIM}{left}{DELIM}{DELIM}{right}{DELIM}")
        rep = F.lit(f"{DELIM}{merged}{DELIM}")
        # no per-round checkpoint: each one costs a job, and replaying
        # r chained replaces over the (already-checkpointed) vocab is
        # linear string work on <= max_words rows — the lineage stays
        # shallow and cheap for any practical merge count
        vocab = vocab.withColumn(
            "state", F.replace(F.col("state"), pat, rep)
        )

    return spark.createDataFrame(
        merges, "round int, left string, right string, merged string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    out: str = "n_subwords",
) -> DataFrame:
    """Apply a learned merge list to every document and report its
    subword count — the tokenizer's encode step, as one chained
    string-replace projection (no Python, no shuffle).

    Each word is delimited independently (spaces become '| |…'
    boundaries are never merged across words because the space symbol
    never appears in a learned merge over space-split words)."""
    state = F.concat(
        F.lit(DELIM),
        F.array_join(
            F.split(F.col(text), ""), DELIM + DELIM
        ),
        F.lit(DELIM),
    )
    for left, right in merges:
        state = F.replace(
            state,
            F.lit(f"{DELIM}{left}{DELIM}{DELIM}{right}{DELIM}"),
            F.lit(f"{DELIM}{left}{right}{DELIM}"),
        )
    n = F.size(F.split(F.substring(state, 2, F.length(state) - 2), "\\|\\|"))
    return df.withColumn(out, n)
