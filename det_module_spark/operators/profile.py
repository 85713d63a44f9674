"""Table profiling: per-column stats in ONE aggregation pass.

Data-quality profiling for pipeline intake: null counts, distinct
counts, min/max per column. All columns' aggregates are computed in a
single job (one scan, one reduce of a single row) and then unpivoted —
profiling a 100 TB table costs exactly one scan regardless of column
count, vs the naive one-job-per-column loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    # singleton groups (n−1 = 0) and constant columns (a zero
    # variance) yield NULL, not an ANSI DIVIDE_BY_ZERO abort — the
    # same guard discipline as grouped_linfit/acf_exact/cuped_report
    return m.select(
        group,
        "n",
        F.when(
            F.col("n") > 1,
            cov_n.cast("double") / F.col("n") / (F.col("n") - 1),
        ).alias("cov_samp"),
        F.when(
            (var_x > 0) & (var_y > 0),
            cov_n.cast("double") / F.sqrt(var_x * var_y),
        ).alias("corr"),
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


def column_entropy(
    df: DataFrame, columns: list[str], digits: int = 6
) -> DataFrame:
    """Shannon entropy (nats) of each column's value distribution:
    → (column, n, n_distinct, entropy).

    Cross-engine float discipline: each value's term −p·ln(p) is
    quantized to a scaled long (1e-9 units) BEFORE summation, so the
    aggregation is an exact integer sum — order-independent — and the
    one rounding at the end is deterministic. (A raw double Σ p·ln p
    differs in the last bits across engines/partition orders.)
    Shape: one unpivot projection + two hash aggregations; shuffle ∝
    Σ per-column cardinality. Nulls count as a regular category.
    """
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.*")
    counts = stacked.groupBy("column", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = Window.partitionBy("column")
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    term_fp = F.floor(-(p * F.log(p)) * F.lit(1e9) + F.lit(0.5)).cast("long")
    out_scale = F.lit(float(10**digits))
    withn = counts.withColumn("n", F.sum("cnt").over(n))
    return (
        withn.groupBy("column")
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(term_fp).alias("__efp"),
        )
        .select(
            "column",
            "n",
            "n_distinct",
            (
                F.floor(
                    F.col("__efp").cast("double") / F.lit(1e9) * out_scale
                    + F.lit(0.5)
                )
                / out_scale
            ).alias("entropy"),
        )
    )


def profile_diff(
    before: DataFrame,
    after: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Schema/statistics drift report between two snapshots of the
    same logical table: full-outer join of their profiles on column
    name with before/after stats and deltas. Null-count or
    distinct-count swings and min/max range changes are the standard
    early-warning signals for upstream pipeline breakage.
    Each profile is ONE aggregate pass (profile_table); the join is
    columns-count sized."""
    p1 = profile_table(before, columns)
    p2 = profile_table(after, columns)
    a = p1.select(
        "column",
        *[
            F.col(c).alias(f"{c}_before")
            for c in ["n_rows", "n_nulls", "n_distinct", "min_str", "max_str"]
        ],
    )
    b = p2.select(
        "column",
        *[
            F.col(c).alias(f"{c}_after")
            for c in ["n_rows", "n_nulls", "n_distinct", "min_str", "max_str"]
        ],
    )
    return a.join(b, "column", "full_outer").select(
        "column",
        "n_rows_before",
        "n_rows_after",
        "n_nulls_before",
        "n_nulls_after",
        "n_distinct_before",
        "n_distinct_after",
        (F.col("n_distinct_after") - F.col("n_distinct_before")).alias(
            "distinct_delta"
        ),
        # null-SAFE change flags: a column present in only one
        # snapshot (the loudest drift — a schema change) has NULL
        # stats on the other side, and a plain != would report NULL
        # instead of TRUE, hiding exactly those rows from a
        # WHERE min_changed consumer. (distinct_delta stays NULL for
        # such columns — there is no before/after pair to subtract.)
        (
            ~F.col("min_str_before").eqNullSafe(F.col("min_str_after"))
        ).alias("min_changed"),
        (
            ~F.col("max_str_before").eqNullSafe(F.col("max_str_after"))
        ).alias("max_changed"),
    )


def equidepth_histogram(
    df: DataFrame,
    value: str,
    tiebreak: str,
    n_buckets: int = 8,
    group: str | None = None,
) -> DataFrame:
    """Exact equi-depth (equal-count) histogram: → (group?, bucket, n,
    min_val, max_val). Buckets are ``ntile`` over the total order
    (value, tiebreak) — the tiebreak column must be unique so the
    bucket assignment is deterministic on every engine.

    Scale shape: per-``group`` curves sort within hash partitions
    (one partitioned window). Ungrouped, the bucket comes from
    ``ids.global_ntile`` — two-phase range enumeration + the closed
    ntile formula — identical output, no single-partition global
    window at any data size.
    """
    if group:
        w = Window.partitionBy(group).orderBy(
            F.asc(value), F.asc(tiebreak)
        )
        bucketed = df.withColumn("bucket", F.ntile(n_buckets).over(w))
    else:
        from det_module_spark.operators.ids import global_ntile

        bucketed = global_ntile(
            df, [value, tiebreak], n_buckets, out="bucket"
        )
    keys = [group] if group else []
    return bucketed.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value).alias("min_val"),
        F.max(value).alias("max_val"),
    )


def grouped_linfit(
    df: DataFrame, group: str, x: str, y: str, digits: int = 6
) -> DataFrame:
    """Per-group simple linear regression (OLS trend) from exact
    integer moments: → (group, n, slope, intercept).

    ``x``/``y`` must be integer-valued (quantize first). Σx, Σy, Σxy,
    Σx² accumulate exactly in int64 — order-independent — then
      slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
      intercept = (Σy − slope·Σx) / n
    with the big products done in double: they may round (> 2^53) but
    identically in every engine, since the operands are exact ints.
    Keep |x|·|y|·n below ~1e18 per group or pre-center x. One
    aggregation pass; groups with zero x-variance yield null."""
    xl, yl = F.col(x).cast("long"), F.col(y).cast("long")
    m = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).alias("sxy"),
        F.sum(xl * xl).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    scale = F.lit(float(10**digits))
    return m.select(
        group,
        "n",
        F.when(
            denom != 0, F.floor(slope * scale + F.lit(0.5)) / scale
        ).alias("slope"),
        F.when(
            denom != 0, F.floor(intercept * scale + F.lit(0.5)) / scale
        ).alias("intercept"),
    )


def quantile_normalize_map(
    df: DataFrame,
    group: str,
    value: str,
    tiebreak: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Quantile-normalization mapping table: → (group, bucket, n,
    group_meanq, ref_meanq). Each group's values are ranked into
    ``n_buckets`` exact equi-depth buckets (per-group window — scales
    with the group count), and the reference value for bucket b is the
    mean over groups of the per-(group, bucket) means: replacing a
    group's bucket-b values with ref b gives every group the same
    distribution while preserving within-group order — the classic
    cross-source score calibration (quantile normalization).

    Integer contract: ``value`` must be integer-valued (quantize
    first); means are 1e6-quantized via truncating int64 division on
    both engines, and the reference mean averages the quantized group
    means (documented choice — it makes the reference independent of
    group sizes AND keeps every step exact int64).
    """
    w = Window.partitionBy(group).orderBy(F.asc(value), F.asc(tiebreak))
    bucketed = df.withColumn("bucket", F.ntile(n_buckets).over(w))
    gb = (
        bucketed.groupBy(group, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("long")).alias("s"),
        )
        .withColumn("group_meanq", F.expr("(s * 1000000) DIV n"))
    )
    ref = gb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("group_meanq").alias("sm"),
    ).select(
        "bucket", F.expr("sm DIV n_groups").alias("ref_meanq")
    )
    return (
        gb.join(ref, "bucket")
        .select(group, "bucket", "n", "group_meanq", "ref_meanq")
    )


def acf_exact(
    df: DataFrame,
    group: str,
    order_cols: list[str],
    value: str,
    max_lag: int = 3,
    out_scale: int = 10**6,
) -> DataFrame:
    """Per-group autocorrelation function at lags 1..``max_lag`` from
    exact integer moments: → (group, lag, n, corrq) with corrq =
    round(out_scale · Pearson r of (x_t, x_{t−lag})).

    ``value`` must be integer-valued (quantize first); ``order_cols``
    must be a deterministic total order within each group (include a
    tiebreak column). One window pass materializes all ``max_lag``
    lagged copies (partitioned BY GROUP — never a global sort), an
    inline posexplode turns them into (lag, x, y) rows, and one hash
    agg per (group, lag) accumulates n, Σx, Σy, Σx², Σy², Σxy exactly
    in int64 — order-independent, so the result is partition-count
    independent and oracle-able. The final r uses doubles only for
    the two variance products and the sqrt/divide: every float op has
    exact-int operands, and IEEE ×, /, √ are correctly rounded, so
    the result is bit-identical across engines. Keep n·Σx² inside
    int64 (ANSI Spark throws loudly on violation, never wraps).

    Scale: lag windows only ever sort within a group partition; the
    moment agg is one shuffle keyed by (group, lag). The seasonality
    companion to grouped_linfit's trend.
    """
    w = Window.partitionBy(group).orderBy(*order_cols)
    xl = F.col(value).cast("long")
    # window exprs must land in their own Project before the explode
    # (Spark rejects window functions inside generator arguments)
    lagged = df.select(
        F.col(group).alias("grp"),
        xl.alias("x"),
        *[F.lag(xl, k).over(w).alias(f"y_{k}") for k in range(1, max_lag + 1)],
    )
    lag_structs = [
        F.struct(
            F.lit(k).alias("lag"),
            F.col("x").alias("x"),
            F.col(f"y_{k}").alias("y"),
        )
        for k in range(1, max_lag + 1)
    ]
    pairs = (
        lagged.select("grp", F.explode(F.array(*lag_structs)).alias("p"))
        .select("grp", "p.lag", "p.x", "p.y")
        .where(F.col("y").isNotNull())
    )
    m = pairs.groupBy("grp", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # covariance/variance numerators stay exact in int64; the product
    # under the sqrt would overflow, so it moves to double (operands
    # exact ⇒ deterministic rounding everywhere)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(vx * vy)
    return m.select(
        F.col("grp").alias(group),
        "lag",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(num / den * F.lit(float(out_scale)) + F.lit(0.5)).cast("long"),
        ).alias("corrq"),
    )


def ewma_exact(
    df: DataFrame,
    group: str,
    order_cols: list[str],
    value: str,
    k: int = 8,
) -> DataFrame:
    """Exponentially weighted moving average with α = 1/2, truncated
    at ``k`` lags and held in EXACT fixed point: → one row per input
    row with ewma_q = Σ_{i<k} x_{t−i}·2^(k−1−i) and wsum = the weight
    mass actually present (2^k − 2^(k−1−m) for m available lags), so
    the caller's ewma = ewma_q / wsum is a ratio of exact int64s.

    α = 1/2 makes every EWMA weight α(1−α)^i = 2^-(i+1) a dyadic
    rational; scaling by 2^k turns the truncated recurrence into pure
    integer arithmetic — order-independent, overflow-loud (ANSI), and
    hash-identical across engines, unlike the float recurrence whose
    result depends on accumulation order. Truncation discards < 2^-k
    of the weight mass (< 0.4% at k = 8). ``value`` must be integer
    (quantize first); ``order_cols`` must be a deterministic total
    order within the group.

    Scale: one window pass partitioned BY GROUP materializes the k
    lags (never a global sort); everything after is per-row Column
    arithmetic. The smoothing companion to acf_exact's seasonality.
    """
    w = Window.partitionBy(group).orderBy(*order_cols)
    xl = F.col(value).cast("long")
    lags = [xl] + [F.lag(xl, i).over(w) for i in range(1, k)]
    ewma_q = None
    wsum = None
    for i, lg in enumerate(lags):
        wt = 1 << (k - 1 - i)
        term = F.when(lg.isNotNull(), lg * F.lit(wt)).otherwise(F.lit(0))
        mass = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        ewma_q = term if ewma_q is None else ewma_q + term
        wsum = mass if wsum is None else wsum + mass
    return df.select(
        F.col(group).alias("grp"),
        *[F.col(c) for c in order_cols],
        ewma_q.cast("long").alias("ewma_q"),
        wsum.cast("long").alias("wsum"),
    )


def cusum_levels(
    df: DataFrame,
    group: str,
    order_cols: list[str],
    value: str,
) -> DataFrame:
    """CUSUM level-shift detection per group, division-free: → one
    row per group (grp, n, s_max, s_min, at_max_0) where s_t is the
    running sum of n·x_i − Σx (i.e. n × the classic cumulative
    deviation from the group mean — same sign structure, exact int64)
    and at_max_0 is the FIRST ``order_cols[0]`` value at which s_t
    attains its maximum (the estimated change point: the mean shifts
    downward right after it).

    Multiplying through by n avoids the mean division entirely, so
    every intermediate is an exact integer and the argmax is
    well-defined across engines. Keep n²·max|x| inside int64 — holds
    through ~10⁶-row groups of 10⁶-unit values; beyond that rescale
    ``value`` first (ANSI Spark throws loudly, never wraps).

    One agg for (n, Σx), one per-group window for the running sum,
    one row_number to pick the earliest maximum — all partitioned by
    the group key; no global sort, no collects.
    """
    xl = F.col(value).cast("long")
    base = df.select(
        F.col(group).alias("grp"),
        *[F.col(c) for c in order_cols],
        xl.alias("x"),
    )
    tot = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    w = Window.partitionBy("grp").orderBy(*order_cols)
    run = (
        base.join(tot, "grp")
        .withColumn("dev", F.col("n") * F.col("x") - F.col("sx"))
        .withColumn(
            "s",
            F.sum("dev").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    pick = Window.partitionBy("grp").orderBy(
        F.desc("s"), *[F.asc(c) for c in order_cols]
    )
    ranked = run.select(
        "grp",
        "n",
        "s",
        F.col(order_cols[0]).alias("at_max_0"),
        F.row_number().over(pick).alias("rk"),
        F.min("s").over(Window.partitionBy("grp")).alias("s_min"),
        F.max("s").over(Window.partitionBy("grp")).alias("s_max"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "grp", "n", "s_max", "s_min", "at_max_0"
    )


def gini_exact(
    df: DataFrame, group: str, value: str, out_scale: int = 10**6
) -> DataFrame:
    """Gini concentration coefficient per group over an integer
    ``value``, exact: → (grp, n, total, gini_ppm) with gini_ppm =
    out_scale·(2·Σ i·x_(i) − (n+1)·Σx) div (n·Σx) over the ascending
    sort ranks i — the inequality/concentration audit ("do 1% of
    sources contribute 90% of tokens?") behind mixture rebalancing.

    Tie-safe: permuting equal values across adjacent ranks leaves
    Σ i·x unchanged, so any deterministic tiebreak gives the same
    integer — no cross-engine ordering hazard. Keep n²·max(x) inside
    int64 (~10⁶ rows of 10⁶-unit values per group; rescale beyond) —
    that bounds the SUMS; the final ·out_scale rescale runs in
    DECIMAL(38,0) so it cannot overflow int64 before the div (the
    quotient itself is ≤ out_scale, always in range). One per-group
    window for ranks + one agg; sorts stay inside the group
    partition.
    """
    base = df.select(
        F.col(group).alias("grp"), F.col(value).cast("long").alias("x")
    )
    w = Window.partitionBy("grp").orderBy(F.asc("x"))
    ranked = base.withColumn("i", F.row_number().over(w))
    g = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    # the ×out_scale happens in DECIMAL(38,0): with the documented
    # int64 envelope on the sums, out_scale·(2·six − (n+1)·sx) can
    # reach ~1e24 — an ANSI ARITHMETIC_OVERFLOW as a long multiply.
    # decimal `div` returns the same integral quotient (as BIGINT)
    # for every in-range input, so values are unchanged where the
    # long form worked.
    gini = F.expr(
        f"(CAST({out_scale} AS DECIMAL(38, 0))"
        f" * (2 * CAST(six AS DECIMAL(38, 0)) - (n + 1) * sx))"
        f" div (n * sx)"
    )
    return g.where(F.col("sx") > 0).select(
        "grp", "n", F.col("sx").alias("total"), gini.alias("gini_ppm")
    )
