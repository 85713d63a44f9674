"""Supervised feature-encoding operators: WOE/IV binning and
out-of-fold target encoding — the classifier-feature preparation stage
of a labeled-data pipeline (quality models, routing classifiers).

Both follow the repo's exact-arithmetic discipline so a DuckDB oracle
hash-matches: counts and sums are int64, logs are quantized to
1e-9-unit longs over EXACT-INTEGER arguments (the nb_classify
convention), and every ratio is a scaled integer division whose
operands stay below 2^53 so a FLOOR(double) is exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1e9  # ln quantization (1e-9 units)
_SHARE_Q = 1_000_000  # distribution-share quantization (1e-6 units)


def _lnq(col):
    return F.floor(
        F.log(col.cast("double")) * F.lit(_Q) + F.lit(0.5)
    ).cast("long")


def woe_binning(
    df: DataFrame,
    value: str,
    tiebreak: str,
    label: str,
    n_bins: int = 8,
) -> DataFrame:
    """Weight-of-evidence over exact equi-depth bins of ``value``:
    → (bucket, n, goods, bads, woeq, ivq).

    ``label`` must be 0/1 integer; ``tiebreak`` must be unique (same
    total-order contract as profile.equidepth_histogram). Buckets come
    from ``ids.global_ntile`` — the two-phase range-enumeration ntile —
    so there is no single-partition global window anywhere in the
    plan; the only data-sized stages are one range shuffle and one
    hash aggregation.

    Exact formulation with add-half smoothing kept integer by
    doubling: g2 = 2·goods+1, b2 = 2·bads+1, gtot = Σg2, btot = Σb2,
      woeq = lnq(g2·btot) − lnq(b2·gtot)        (1e-9-unit long)
      ivq  = ((g2·S DIV gtot − b2·S DIV btot) · woeq) DIV S, S = 1e6
    so ivq is in 1e-9 units like woeq (the share-difference's 1e-6
    scale cancels against the trailing DIV S) and Σivq/1e9 ≈ the
    information value. All divisions are int64
    truncating division — Spark's DIV and DuckDB's // share that
    semantics (verified incl. negatives), so no float ever rounds.
    """
    from det_module_spark.operators.ids import global_ntile

    bins = (
        global_ntile(df, [value, tiebreak], n_bins, out="bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label).cast("long")).alias("goods"),
        )
        .withColumn("bads", F.col("n") - F.col("goods"))
        .withColumn("g2", F.lit(2) * F.col("goods") + 1)
        .withColumn("b2", F.lit(2) * F.col("bads") + 1)
    )
    tot = bins.agg(
        F.sum("g2").alias("gtot"), F.sum("b2").alias("btot")
    )
    # tot derives from bins — a self-join; qualify every reference so
    # Spark 4's strict resolver never sees a bare ambiguous attribute
    out = bins.alias("bb").crossJoin(tot.alias("tt"))
    woeq = _lnq(F.col("bb.g2") * F.col("tt.btot")) - _lnq(
        F.col("bb.b2") * F.col("tt.gtot")
    )
    return out.withColumn("woeq", woeq).select(
        F.col("bb.bucket").alias("bucket"),
        F.col("bb.n").alias("n"),
        F.col("bb.goods").alias("goods"),
        F.col("bb.bads").alias("bads"),
        "woeq",
        F.expr(
            f"((bb.g2 * {_SHARE_Q} DIV tt.gtot"
            f" - bb.b2 * {_SHARE_Q} DIV tt.btot)"
            f" * woeq) DIV {_SHARE_Q}"
        ).alias("ivq"),
    )


def target_encode_oof(
    df: DataFrame,
    cat: str,
    label: str,
    fold_col: str,
    n_folds: int,
) -> DataFrame:
    """Out-of-fold target encoding — the leakage-safe categorical
    encoder: a row in fold f gets the mean label of its category
    computed WITHOUT fold f. → one row per (category × fold):
    (cat, fold, n_oof, oof_meanq) with oof_meanq the 1e-6-quantized
    mean (NULL when the category has no rows outside the fold).

    Every (category, fold) cell is emitted, including folds where the
    category has no rows (their encoding is the full-category mean) —
    the encoder table is complete for joining against any future
    split. ``fold_col`` must be an integer in [0, n_folds); derive it
    from a salted hash of a stable row key in production (a plain
    ``key % n_folds`` is deterministic but not adversarially random).

    Scale shape: two hash aggregations ((cat, fold) sums, then cat
    totals) + a literal explode of the fold range — no windows, no
    per-row joins; the encoder output is (|categories| × n_folds)
    rows, control-plane sized for any realistic cardinality.
    """
    per_fold = df.groupBy(
        F.col(cat).alias("cat"), F.col(fold_col).alias("fold")
    ).agg(
        F.count(F.lit(1)).alias("n_f"),
        F.sum(F.col(label).cast("long")).alias("sum_f"),
    )
    totals = per_fold.groupBy("cat").agg(
        F.sum("n_f").alias("n_tot"), F.sum("sum_f").alias("sum_tot")
    )
    grid = totals.select(
        "cat",
        "n_tot",
        "sum_tot",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_folds)])
        ).alias("fold"),
    )
    j = grid.join(per_fold, ["cat", "fold"], "left").select(
        "cat",
        "fold",
        (F.col("n_tot") - F.coalesce("n_f", F.lit(0))).alias("n_oof"),
        (
            F.col("sum_tot") - F.coalesce("sum_f", F.lit(0))
        ).alias("sum_oof"),
    )
    return j.select(
        "cat",
        "fold",
        "n_oof",
        F.when(
            F.col("n_oof") > 0,
            F.expr(f"(sum_oof * {_SHARE_Q}) DIV n_oof"),
        ).alias("oof_meanq"),
    )


def feature_hash_profile(
    df: DataFrame, features: list[str], buckets: int = 64
) -> DataFrame:
    """Hashing-trick audit: hash every (feature, value) token into
    ``buckets`` slots with a deterministic md5 draw plus a ± sign bit
    (the feature-hashing construction of Weinberger et al.'s public
    formulation), then profile the folding: → (bucket, n_rows,
    n_tokens, net_sign) where n_tokens counts DISTINCT tokens folded
    into the slot (collisions ⇔ n_tokens > 1) and net_sign = Σ± shows
    how much the sign trick cancels collision mass.

    This is the report a pipeline reads before committing to a
    hashed feature space: which slots collide, and whether the
    signed sum keeps the inner-product estimator unbiased enough at
    the chosen width. One explode to |features| rows per input row,
    one hash agg keyed by bucket — linear, no joins, no vocabulary
    table (the entire point of the hashing trick at 100 TB: the
    encoder is stateless).
    """
    from det_module_spark.operators.dedup import stable_hash64

    toks = df.select(
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "=", F.lit(c), F.col(c).cast("string")
                    ).alias("tok")
                    for c in features
                ]
            )
        ).alias("tok")
    )
    # sign bit = bit just above the bucket field: (h div buckets) % 2
    # == (h % (2·buckets)) < buckets — pure mod, exact at 60-bit h
    # (a float division would round above 2^53; playbook #7)
    h = stable_hash64(F.col("tok"))
    hashed = toks.select(
        "tok",
        (h % buckets).alias("bucket"),
        F.when(h % (2 * buckets) < buckets, 1).otherwise(-1).alias("sign"),
    )
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("tok").alias("n_tokens"),
        F.sum("sign").alias("net_sign"),
    )
