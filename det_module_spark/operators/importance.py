"""DSIR-style data selection: importance weights from contrastive
unigram models (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public method description).

Given a small TARGET corpus (the domain you want more of) and the RAW
corpus to select from, each raw document gets an importance weight

    w(d) = ln p_target(d) − ln p_raw(d)

under add-one-smoothed unigram models sharing one joint vocabulary.
High-weight documents look like the target domain; selection keeps the
top slice (or samples proportionally — composable with sampling.py).

Float discipline (ROUND_NOTES): identical to nbayes.py — every term is
ln of an exact integer quantized to 1e-9-unit int64 before summing, so
weights are order-independent integers and hash cross-engine. The same
smoothing rearrangement applies per side:

    w_q(d) = Σ_{t∈d} [lnq(c_T(t)+1) − lnq(c_R(t)+1)]
             − n_d · [lnq(tot_T + V) − lnq(tot_R + V)]

so terms unseen in BOTH models contribute exactly 0 and the token join
is an inner join against the observed joint vocabulary.

Scale shape: two count aggregations (target is small by definition,
raw is one linear pass), one full-outer vocabulary merge, one
vocabulary equi-join for scoring (all un-hinted — the model tables are
corpus-derived), one per-doc aggregation. The two model scalars
(penalty per token for each side) are driver-side control plane. The
top-k threshold is a TakeOrtdered limit (k rows) — no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from det_module_spark.operators.nbayes import _lnq
from det_module_spark.operators.text import tokens


def _unigram_counts(df: DataFrame, text: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.col(text))).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-raw-document importance weight → (id, n_toks, weightq),
    weightq in 1e-9 ln units (positive = target-like). EVERY raw id
    gets a row: a document with zero qualifying tokens (empty or
    whitespace-only text) has an empty log-likelihood ratio — n_toks
    0, weightq 0 — rather than silently vanishing from the weights
    table (and from every downstream join/selection)."""
    ct = _unigram_counts(target, text)
    cr = _unigram_counts(raw, text)
    # joint vocabulary: full-outer merge; a term absent from one model
    # counts 0 there (its +1 smoothing survives in the delta)
    # vocab-sized model table with TWO consumers (the totals scalar
    # below and the per-token scoring join) — materialize once, or
    # Catalyst re-evaluates the full target+raw scan/explode/agg
    # subtree per consumer: 2 extra corpus passes for the same rows
    # at any scale (VERDICT r09 #4, the krippendorff-fix shape)
    delta = (
        ct.withColumnRenamed("cnt", "cnt_t")
        .join(cr.withColumnRenamed("cnt", "cnt_r"), "term", "full_outer")
        .select(
            "term",
            (
                _lnq(F.coalesce("cnt_t", F.lit(0)) + F.lit(1))
                - _lnq(F.coalesce("cnt_r", F.lit(0)) + F.lit(1))
            ).alias("deltaq"),
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
        )
        .localCheckpoint(eager=True)
    )
    # control-plane scalars: V (joint vocab), per-model token totals
    totals = delta.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cnt_t").alias("tot_t"),
        F.sum("cnt_r").alias("tot_r"),
    ).collect()[0]
    import math

    def lnq(x: int) -> int:
        return math.floor(math.log(float(x)) * 1e9 + 0.5)

    penaltyq = lnq(int(totals.tot_t) + int(totals.v)) - lnq(
        int(totals.tot_r) + int(totals.v)
    )
    dt = raw.select(
        F.col(id_col), F.explode(tokens(F.col(text))).alias("term")
    ).filter(F.length("term") > 0)
    sums = (
        dt.join(delta.select("term", "deltaq"), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("deltaq").alias("sumq"),
        )
    )
    # re-attach zero-token documents (no rows survive the explode +
    # length filter, so the groupBy never emits them): a left join
    # from the pruned (id-only) raw scan, coalescing to the empty-sum
    # identity (0 tokens, weight 0)
    return raw.select(F.col(id_col)).join(sums, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_toks"), F.lit(0).cast("long")).alias(
            "n_toks"
        ),
        F.coalesce(
            F.col("sumq") - F.col("n_toks") * F.lit(penaltyq),
            F.lit(0).cast("long"),
        ).alias("weightq"),
    )


def dsir_select(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Flag the top-``k`` documents by weight (ties at the threshold
    all selected — deterministic without a global window). The
    threshold is TakeOrdered over (weightq desc, id) — k rows on the
    driver, control plane — re-joined as a 1-row scalar.

    The weights table has two consumers (the threshold scalar and the
    flagging pass); it is compact — one (id, n_toks, weightq) row per
    raw document — so materialize it once instead of letting Catalyst
    re-run the whole upstream corpus scan + vocab join per consumer
    (VERDICT r09 #4)."""
    weights = weights.localCheckpoint(eager=True)
    thresh = (
        weights.orderBy(F.col("weightq").desc(), F.col(id_col))
        .limit(k)
        .agg(F.min("weightq").alias("minw"))
    )
    return weights.crossJoin(F.broadcast(thresh)).select(
        id_col,
        "n_toks",
        "weightq",
        (F.col("weightq") >= F.col("minw")).alias("selected"),
    )
