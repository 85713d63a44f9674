"""Cross-corpus line-level deduplication (C4 / RefinedWeb-style
boilerplate removal).

Whole-document dedup (dedup.py) misses the dominant form of web
duplication: the SAME navigation/footer/license line pasted into
millions of otherwise-distinct pages. The C4 pipeline drops any line
occurring ≥ N times in the corpus; RefinedWeb removes all occurrences,
C4 proper keeps exactly one. Both policies here.

Scale shape (the whole point): explode documents to lines, one hash
aggregation over the line corpus for document-frequencies (map-side
partial combine, then one shuffle on the line hash), one shuffle
equi-join back to the exploded lines (AQE picks the strategy — the
frequency table is corpus-derived and must NOT be broadcast-hinted),
and one per-document re-aggregation. Everything is linear in corpus
size, JVM-side, whole-stage-codegen; there is no all-pairs step and
no driver-side loop, so the plan survives 100 TB unchanged.

Line granularity is the caller's: pass any (id, idx, line) frame.
``split_fixed_lines`` builds one from flat text by fixed word windows
(the synthetic corpus has no newline structure); real web text would
split on '\\n' instead (`F.posexplode(F.split(text, '\\n'))`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_fixed_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    words_per_line: int = 10,
) -> DataFrame:
    """(id, text) -> (id, idx, line): consecutive ``words_per_line``-
    word windows of the whitespace-split text, idx 0-based. The last
    line of a document may be short. Null texts are dropped (a null
    document has no lines). Pure per-row JVM expressions — no shuffle,
    no UDF."""
    toks = F.split(F.col(text), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(float(words_per_line))).cast(
        "int"
    )
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.struct(
            i.cast("long").alias("idx"),
            F.array_join(
                F.slice(toks, i * words_per_line + 1, words_per_line), " "
            ).alias("line"),
        ),
    )
    return (
        df.filter(F.col(text).isNotNull())
        .select(F.col(id_col), F.explode(lines).alias("l"))
        .select(id_col, "l.idx", "l.line")
    )


def line_doc_freq(
    lines: DataFrame, id_col: str = "doc_id", line_col: str = "line"
) -> DataFrame:
    """Per-line distinct-document frequency + the globally first
    occurrence (min (doc, idx) struct — lexicographic, so: lowest doc
    id, then lowest idx within it). One hash aggregation."""
    return lines.groupBy(line_col).agg(
        F.countDistinct(id_col).alias("ndocs"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i"))).alias(
            "first_occ"
        ),
    )


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    min_docs: int = 2,
    policy: str = "drop_all",
    joiner: str = " ",
) -> DataFrame:
    """Remove corpus-duplicated lines and reassemble documents.

    A line is *boilerplate* when it occurs in ≥ ``min_docs`` distinct
    documents. ``policy``:

    - ``drop_all`` (RefinedWeb): every occurrence of a boilerplate
      line is removed.
    - ``keep_first`` (C4): the single globally-first occurrence
      (lowest doc id, then lowest idx) survives; the rest are removed.

    Returns one row per input document — including documents that were
    *entirely* boilerplate (n_kept = 0, clean_text = ''): dropping a
    document silently is how a cleaning stage corrupts downstream
    joins. Columns: (id, n_lines, n_kept, clean_text).
    """
    if policy not in ("drop_all", "keep_first"):
        raise ValueError(f"unknown policy: {policy!r}")
    freq = line_doc_freq(lines, id_col, line_col)
    # corpus-derived frequency table: NO broadcast hint (AQE decides;
    # a forced broadcast is an executor OOM at corpus scale).
    # NULL-SAFE join key: a NULL line groups with the other NULL
    # lines in the frequency table like any other equal value — a
    # plain equi-join would drop those rows, undercounting n_lines
    # and deleting an all-NULL-line document from the output entirely
    # (the exact contract violation the docstring warns about).
    freq_r = freq.withColumnRenamed(line_col, "__freq_line")
    flagged = lines.join(
        freq_r, F.col(line_col).eqNullSafe(F.col("__freq_line"))
    ).drop("__freq_line")
    unique_enough = F.col("ndocs") < F.lit(min_docs)
    if policy == "drop_all":
        keep = unique_enough
    else:
        keep = unique_enough | (
            (F.col("first_occ.d") == F.col(id_col))
            & (F.col("first_occ.i") == F.col("idx"))
        )
    flagged = flagged.withColumn("__keep", keep)
    kept_line = F.when(
        F.col("__keep"), F.struct(F.col("idx"), F.col(line_col))
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            # collect_list skips the nulls of dropped lines; the
            # array_sort on (idx, line) structs restores document
            # order (idx is unique per doc) regardless of partition
            # arrival order, so reassembly is deterministic
            F.transform(
                F.array_sort(F.collect_list(kept_line)),
                lambda s: s.getField(line_col),
            ),
            joiner,
        ).alias("clean_text"),
    )
