"""Distributed multinomial Naive Bayes — fit and score as pure
DataFrame aggregations.

The production use is fastText-style quality/domain classification of
training-data corpora (label a seed set, fit, score everything, filter
or reweight by predicted class). NB is the one text classifier whose
fit IS a group-by — per-(label, term) counts — so at 100 TB it costs
two hash aggregations and no iterative optimizer, and scoring is one
vocabulary equi-join + one per-document aggregation. No MLlib, no
driver-side model materialization beyond two scalars: the model stays
a DataFrame and joins like any other table.

Float discipline (ROUND_NOTES): every log term is ln of an exact
integer, quantized to 1e-9-unit int64 BEFORE any sum, so scores are
order-independent integers and cross-engine hash-exact:

    score(d, c) = priorq(c) + Σ_{t∈d} lnq(count(t,c)+1)
                  − n_d · lnq(total_c + V)

which is add-one-smoothed multinomial NB rearranged so that unseen
(t, c) pairs contribute lnq(1) = 0 — the token join can therefore be
an INNER join on the observed vocabulary (no class × token cross
product materialized; the only row-multiplier is docs × #labels,
bounded by the label vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from det_module_spark.operators.text import tokens

_Q = 1e9


def _lnq(col):
    """ln of an exact-integer column, quantized to 1e-9-unit int64
    (round-half-up via FLOOR, matching the oracle's formulation)."""
    return F.floor(F.log(col.cast("double")) * F.lit(_Q) + F.lit(0.5)).cast(
        "long"
    )


def nb_fit(
    train: DataFrame, label_col: str = "label", text: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Fit add-one-smoothed multinomial NB on a labeled corpus.

    Returns ``(token_stats, class_stats)``:

    - token_stats: (term, label, lnc1q) with lnc1q = lnq(count+1) —
      vocabulary × label sized, stays distributed, joins un-hinted.
    - class_stats: (label, priorq, penaltyq) — ONE ROW PER LABEL
      (bounded by the label vocabulary, the documented justification
      for the scoring cross join), priorq = lnq(n_docs_label) −
      lnq(n_docs), penaltyq = lnq(total_tokens_label + V).

    V (distinct training terms) and the training doc count are the
    only driver-side scalars — control-plane, one number each.
    """
    toks = train.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text))).alias("term"),
    ).filter(F.length("term") > 0)
    tc = toks.groupBy("label", "term").agg(F.count(F.lit(1)).alias("cnt"))
    token_stats = tc.select(
        "term", "label", _lnq(F.col("cnt") + F.lit(1)).alias("lnc1q")
    )
    v = tc.select("term").distinct().count()
    n_docs = train.count()
    class_tot = tc.groupBy("label").agg(F.sum("cnt").alias("tot"))
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs_label")
    )
    class_stats = class_docs.join(class_tot, "label").select(
        "label",
        (_lnq(F.col("n_docs_label")) - F.lit(int(_ln_int_q(n_docs)))).alias(
            "priorq"
        ),
        _lnq(F.col("tot") + F.lit(v)).alias("penaltyq"),
    )
    return token_stats, class_stats


def _ln_int_q(n: int) -> int:
    import math

    return math.floor(math.log(float(n)) * _Q + 0.5)


def nb_score(
    docs: DataFrame,
    token_stats: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Score documents under a fitted model: per-(doc, label)
    quantized log-score for every label. → (id, label, scoreq).

    Shape: explode → inner vocabulary join (un-hinted; the model
    table is corpus-derived) → per-(doc, label) sum, then the
    doc-frame × class_stats row-multiplier (one row per label —
    bounded) and a left join for docs sharing no vocabulary with a
    class (their token sum is exactly 0 by the smoothing rearrange)."""
    dt = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text))).alias("term")
    ).filter(F.length("term") > 0)
    n_d = dt.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_toks"))
    tok_sums = (
        dt.join(token_stats, "term")
        .groupBy(id_col, "label")
        .agg(F.sum("lnc1q").alias("sumq"))
    )
    base = n_d.crossJoin(class_stats)
    return base.join(tok_sums, [id_col, "label"], "left").select(
        id_col,
        "label",
        (
            F.col("priorq")
            + F.coalesce(F.col("sumq"), F.lit(0))
            - F.col("n_toks") * F.col("penaltyq")
        ).alias("scoreq"),
    )


def nb_classify(
    docs: DataFrame,
    token_stats: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Argmax over ``nb_score``: (id, pred, scoreq). Ties break to the
    lexicographically LARGEST label (max over (scoreq, label) structs
    — deterministic on any engine/partitioning)."""
    scored = nb_score(docs, token_stats, class_stats, id_col, text)
    best = F.max(F.struct(F.col("scoreq"), F.col("label"))).alias("b")
    return scored.groupBy(id_col).agg(best).select(
        id_col,
        F.col("b.label").alias("pred"),
        F.col("b.scoreq").alias("scoreq"),
    )
