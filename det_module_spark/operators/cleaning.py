"""Data-cleaning operators: group-mean imputation and z-score outlier
flagging.

Both are single-shuffle window shapes (partition by the group key, no
ordering — so no sort, just hash exchange + window aggregates), and
both are engineered for cross-engine determinism: feed integer-valued
(or integer-quantized) measures and every derived statistic is exact
integer arithmetic until one final deterministic IEEE divide/sqrt —
see the float-parity playbook in ROUND_NOTES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_group_mean(
    df: DataFrame, value: str, group: str, out: str | None = None
) -> DataFrame:
    """Fill nulls in ``value`` with the mean of the non-null values in
    the same ``group``. ``avg`` ignores nulls, so the fill value is the
    observed-data mean. For integer-valued measures the window sum is
    exact and the result is bit-identical across engines and partition
    orders. Groups that are entirely null stay null."""
    w = Window.partitionBy(group)
    return df.withColumn(
        out or value, F.coalesce(F.col(value), F.avg(value).over(w))
    )


def zscore_outliers(
    df: DataFrame,
    value: str,
    group: str,
    threshold: float = 3.0,
    z_col: str = "zscore",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Per-group z-score + outlier flag from exact integer moments.

    ``value`` must be integer-valued (quantize floats first). The
    window computes Σx and Σx² exactly in int64; sample variance and
    the z-score are then derived in double with a fixed op order —
    deterministic everywhere. Groups with n < 2 get z = null.

    z = (n·x − Σx) / (n · sd)  with  sd² = (n·Σx² − (Σx)²) / (n(n−1))
    the products are computed in double (exact-int inputs) so nothing
    overflows int64 even at 100 TB group sizes.
    """
    v = F.col(value).cast("long")
    w = Window.partitionBy(group)
    n = F.sum(F.when(v.isNotNull(), 1).otherwise(0)).over(w).cast("double")
    sx = F.sum(v).over(w).cast("double")
    sxx = F.sum(v * v).over(w).cast("double")
    var = (n * sxx - sx * sx) / (n * (n - 1))
    z = F.when(
        (n >= 2) & (var > 0),
        (n * v.cast("double") - sx) / n / F.sqrt(var),
    )
    return df.withColumn(z_col, z).withColumn(
        flag_col, F.abs(F.col(z_col)) > threshold
    )


def winsorize(
    df: DataFrame,
    value: str,
    group: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip ``value`` (an integer-valued
    measure — quantize floats first) to its group's [lower, upper]
    linearly-interpolated percentiles, the standard outlier-robust
    cleaning step before scaling/normalizing.

    The interpolated percentile of integers can be fractional; it is
    rounded half-up to the nearest integer BEFORE clipping so every
    output value stays exactly representable — downstream sums then
    stay order-independent (the reason this is oracle-checkable).
    Shape: one window shuffle on the group key (no sort — percentile
    is an aggregate), clip is a codegen'd projection."""
    w = Window.partitionBy(group)
    v = F.col(value).cast("long")

    def pct(p: float):
        raw = F.percentile(v, F.lit(p)).over(w)
        return F.floor(raw + F.lit(0.5)).cast("long")

    lo, hi = pct(lower), pct(upper)
    return (
        df.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn(
            f"{value}_wins", F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
        )
        .withColumn("clipped_low", v < F.col("__lo"))
        .withColumn("clipped_high", v > F.col("__hi"))
        .drop("__lo", "__hi")
    )


def mad_outliers(
    df: DataFrame,
    value: str,
    group: str,
    k: float = 3.0,
    med_col: str = "med",
    mad_col: str = "mad",
    flag_col: str = "is_mad_outlier",
) -> DataFrame:
    """Robust (median/MAD) outlier flagging per group — the
    breakdown-resistant alternative to z-scores when the group itself
    is contaminated. ``value`` must be integer-valued.

    med = group median (interpolated, rounded half-up to an integer),
    mad = median of |v − med| (same rounding), flag = |v − med| >
    k·mad. Rounding the two medians to ints keeps every derived
    quantity exactly representable, so the flags are engine-exact;
    groups with mad = 0 get null flags (no scale to judge by).
    Shape: two window passes over the same group partitioning (one
    hash exchange; the second window reuses the partitioning)."""
    w = Window.partitionBy(group)
    v = F.col(value).cast("long")
    med = F.floor(F.percentile(v, F.lit(0.5)).over(w) + F.lit(0.5)).cast(
        "long"
    )
    with_med = df.withColumn(med_col, med)
    dev = F.abs(v - F.col(med_col))
    mad = F.floor(
        F.percentile(dev, F.lit(0.5)).over(w) + F.lit(0.5)
    ).cast("long")
    with_mad = with_med.withColumn(mad_col, mad)
    return with_mad.withColumn(
        flag_col,
        F.when(
            F.col(mad_col) > 0,
            dev.cast("double") > F.lit(k) * F.col(mad_col).cast("double"),
        ),
    )
