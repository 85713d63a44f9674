"""Table profiling: per-column stats in ONE aggregation pass.

Data-quality profiling for pipeline intake: null counts, distinct
counts, min/max per column. All columns' aggregates are computed in a
single job (one scan, one reduce of a single row) and then unpivoted —
profiling a 100 TB table costs exactly one scan regardless of column
count, vs the naive one-job-per-column loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame, col: str, bin_width: float, out_prefix: str = "bin"
) -> DataFrame:
    """Fixed-width histogram of a numeric column: one hash aggregation
    keyed by ``floor(col / bin_width)``. Bin count is data-independent
    (bounded by value range / width), so the shuffle is tiny at any
    scale; map-side partial counts do the real work in the scan."""
    b = F.floor(F.col(col) / F.lit(bin_width)).alias(out_prefix)
    return (
        df.groupBy(b)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            out_prefix,
            (F.col(out_prefix) * F.lit(bin_width)).alias(f"{out_prefix}_lo"),
            "n_rows",
        )
    )


def grouped_corr_exact(
    df: DataFrame, group: str, x: str, y: str
) -> DataFrame:
    """Pearson correlation + sample covariance per group from EXACT
    integer moments.

    ``x``/``y`` must be integer-valued columns (quantize floats to a
    fixed decimal first — see ROUND_NOTES float-parity playbook): the
    five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) then accumulate
    exactly in int64, making the derived corr/cov bit-identical across
    engines and partition orders — unlike ``F.corr``, whose float
    accumulation order varies. One aggregation pass, map-side partials.
    """
    xl, yl = F.col(x).cast("long"), F.col(y).cast("long")
    m = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).alias("sxy"),
        F.sum(xl * xl).alias("sxx"),
        F.sum(yl * yl).alias("syy"),
    )
    # numerators stay integer (exact); cast to double only at the final
    # divide/sqrt, whose IEEE results are deterministic given exact ints
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        group,
        "n",
        (cov_n.cast("double") / F.col("n") / (F.col("n") - 1)).alias("cov_samp"),
        (cov_n.cast("double") / F.sqrt(var_x * var_y)).alias("corr"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """→ (column, n_rows, n_nulls, n_distinct, min_str, max_str), one
    row per profiled column. min/max are canonicalized to strings so
    heterogeneous column types share one output schema."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_str"),
                F.col(f"_max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
