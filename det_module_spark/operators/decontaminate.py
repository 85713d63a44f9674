"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

Standard practice for pretraining corpora (the reference has no
equivalent — this is a north-star training-pipeline operator per
BASELINE.json): any training document sharing >= ``min_overlap``
n-gram shingles with a benchmark document is "contaminated" and gets
dropped or down-weighted before training.

Scale shape (100 TB corpus vs ~MB-scale benchmarks): the benchmark
shingle set is tiny — DISTINCT it, broadcast it, and the whole pass is
one broadcast semi-join inside the corpus scan plus one per-doc
aggregation. No corpus-sized shuffle of shingles is ever needed; the
only shuffle is the per-doc overlap count, keyed by doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from det_module_spark.operators.text import word_shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Per-corpus-document contamination stats against ``benchmark``.

    Returns one row per corpus document:
      ``(id_col, n_shingles, n_overlap, overlap_frac, contaminated)``
    where ``n_shingles`` counts the document's DISTINCT word n-grams,
    ``n_overlap`` those also present anywhere in the benchmark set, and
    ``contaminated`` is ``n_overlap >= min_overlap``.

    ``overlap_frac`` is a single IEEE division of two exact integers —
    bit-identical across engines, no rounding needed.
    """
    corp_sh = word_shingles(corpus, id_col=id_col, text=text, n=n)
    bench_sh = (
        word_shingles(benchmark, id_col=id_col, text=text, n=n)
        .select("shingle")
        .distinct()
    )
    # left join against the broadcast benchmark vocabulary: keeps every
    # corpus shingle row so n_shingles and n_overlap come out of ONE
    # aggregation (a semi-join would need a second scan for the totals)
    marked = corp_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    stats = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_overlap"),
    )
    # one row per corpus document, INCLUDING documents with zero
    # shingles (NULL/empty/whitespace text emits no shingle rows, so
    # the groupBy alone would drop them — and a consumer inner-joining
    # this report to route docs would silently lose them). Zero
    # shingles → 0/0 overlap, fraction defined as 0, not an ANSI
    # divide-by-zero.
    return corpus.select(F.col(id_col)).join(stats, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_shingles"), F.lit(0).cast("long")).alias(
            "n_shingles"
        ),
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias(
            "n_overlap"
        ),
        F.when(
            F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
            F.col("n_overlap").cast("double")
            / F.col("n_shingles").cast("double"),
        ).otherwise(F.lit(0.0)).alias("overlap_frac"),
        (
            F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap
        ).alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Drop contaminated documents from ``corpus``. Anti-join of the
    corpus against the flagged id set. The id set is USUALLY
    proportional to the contamination rate — but it is corpus-derived
    (a scrape that quotes benchmark text everywhere makes it
    corpus-sized), so it is deliberately NOT broadcast-hinted: AQE
    broadcasts it while small and shuffles when it grows, the same
    no-forced-corpus-broadcast rule as setsim/basket/linededup."""
    flagged = (
        contamination_report(
            corpus, benchmark, n=n, id_col=id_col, text=text, min_overlap=min_overlap
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")
