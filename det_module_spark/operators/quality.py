"""Data-quality rule checking: functional dependencies and
dictionary encoding.

The reference trusts its inputs (schemas implied by convention,
SURVEY.md §1.3); a 100 TB warehouse can't. These operators turn two
classic quality/layout tools into single-shuffle dataflows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fd_violations(
    df: DataFrame, lhs: list[str], rhs: str
) -> DataFrame:
    """Audit the functional dependency lhs → rhs: one row per lhs
    tuple with more than one distinct rhs value:
    → (lhs..., n_rows, n_rhs_values). Empty result = FD holds.
    One hash aggregation (count_distinct is a partial-aggregable
    sketchless exact count here — fine for per-group cardinalities;
    swap approx_count_distinct at extreme group counts).

    NULL counts as a distinct rhs STATE: count_distinct ignores
    NULLs, so a group mapping to {value, NULL} would otherwise audit
    as consistent — a null-presence flag adds it back. A group whose
    rhs is entirely NULL has one state and passes."""
    return (
        df.groupBy(*lhs)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.count_distinct(F.col(rhs))
                + F.max(
                    F.when(F.col(rhs).isNull(), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
            ).alias("n_rhs_values"),
        )
        .filter(F.col("n_rhs_values") > 1)
    )


def dictionary_encode(
    df: DataFrame, col: str, code_col: str = "code"
) -> tuple[DataFrame, DataFrame]:
    """Order-preserving dictionary encoding: → (dictionary, encoded).
    The dictionary maps each distinct value to a dense integer code in
    value order (dense_rank over the DISTINCT values — the window input
    is dictionary-sized, not data-sized); the encoded frame joins the
    dictionary back (broadcast — dictionaries are small by
    definition, else you wouldn't dict-encode)."""
    dictionary = (
        df.select(F.col(col)).distinct()
        .withColumn(
            code_col,
            F.dense_rank().over(Window.partitionBy().orderBy(F.asc(col))),
        )
    )
    # null-safe join key: the dictionary assigns NULL a code (it
    # sorts first → code 1), and a plain equi-join would silently
    # DROP every null row from the encoded frame. eqNullSafe is
    # still a hash-join key, so the broadcast join shape is
    # unchanged; the dictionary side is renamed to keep the
    # self-derived lineage unambiguous.
    d = dictionary.withColumnRenamed(col, "__dict_value")
    encoded = (
        df.join(
            F.broadcast(d), F.col(col).eqNullSafe(F.col("__dict_value"))
        )
        .drop("__dict_value")
        .drop(col)
    )
    return dictionary, encoded


def benford_audit(
    df: DataFrame, value: str, digits: int = 6
) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column:
    → (digit, n, observed_p, expected_p, chi2_term) — one row per
    leading digit 1-9, with the χ² contribution
    (obs−exp)²/exp · n_total for each. Fraud/data-quality screen for
    "organically grown" magnitudes (amounts, populations).

    All ratios divide exact integer counts; expected_p =
    log10(1 + 1/d) is a per-row constant — no cross-engine float
    accumulation anywhere (the χ² terms are per-digit, summing is the
    caller's choice). One projection + one 9-group aggregation."""
    # first nonzero digit of the decimal rendering; works for plain
    # and scientific notation alike (the mantissa leads either way)
    first = F.regexp_extract(
        F.abs(F.col(value)).cast("string"), "[1-9]", 0
    )
    observed = (
        df.filter(F.col(value).isNotNull() & (F.abs(F.col(value)) > 0))
        .select(first.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # dense 1-9 spine: a digit the data never produces still carries
    # Benford mass, and its (0−exp)²/exp·N χ² contribution is exactly
    # what flags a severely non-Benford column — dropping absent
    # digits (the groupBy's natural output) would understate the
    # statistic and break the "one row per digit" contract
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = (
        spine.join(observed, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
        .withColumn("n_total", F.sum("n").over(Window.partitionBy()))
    )
    scale = F.lit(float(10**digits))
    # guard the all-empty input (n_total = 0): observed share is 0,
    # not an ANSI DIVIDE_BY_ZERO abort
    obs = F.when(
        F.col("n_total") > 0,
        F.col("n").cast("double") / F.col("n_total").cast("double"),
    ).otherwise(F.lit(0.0))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi2 = (obs - exp) * (obs - exp) / exp * F.col("n_total").cast("double")
    return counts.select(
        "digit",
        "n",
        (F.floor(obs * scale + F.lit(0.5)) / scale).alias("observed_p"),
        (F.floor(exp * scale + F.lit(0.5)) / scale).alias("expected_p"),
        (F.floor(chi2 * scale + F.lit(0.5)) / scale).alias("chi2_term"),
    )


def psi_drift(
    before: DataFrame,
    after: DataFrame,
    value: str,
    bin_width: float,
    digits: int = 6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column, binned at ``bin_width``: → (bin, n_before, n_after,
    p_before, p_after, psi_term) with
    psi_term = (p_a − p_b) · ln(p_a / p_b). The standard ML-ops
    drift score (PSI > 0.2 ⇒ investigate); total PSI = Σ psi_term
    (per-bin rows returned so the caller sums with its own float
    discipline). Bins empty on one side get the standard 1e-6 floor
    instead of ±∞. Two fixed-width-histogram aggs + one outer join on
    the bin id — bin count is range/width, independent of data size."""
    def hist(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(F.col(value).isNotNull())
            .groupBy(
                F.floor(F.col(value) / F.lit(bin_width)).alias("bin")
            )
            .agg(F.count(F.lit(1)).alias(alias))
        )

    hb = hist(before, "n_before")
    ha = hist(after, "n_after")
    j = hb.join(ha, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_before", F.lit(0)).alias("n_before"),
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
    )
    tb = Window.partitionBy()
    floor_p = F.lit(1e-6)
    p_b = F.greatest(
        F.col("n_before").cast("double")
        / F.sum("n_before").over(tb).cast("double"),
        floor_p,
    )
    p_a = F.greatest(
        F.col("n_after").cast("double")
        / F.sum("n_after").over(tb).cast("double"),
        floor_p,
    )
    scale = F.lit(float(10**digits))
    term = (p_a - p_b) * F.log(p_a / p_b)
    return j.select(
        "bin",
        "n_before",
        "n_after",
        (F.floor(p_b * scale + F.lit(0.5)) / scale).alias("p_before"),
        (F.floor(p_a * scale + F.lit(0.5)) / scale).alias("p_after"),
        (F.floor(term * scale + F.lit(0.5)) / scale).alias("psi_term"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_scale: int = 10**6,
) -> DataFrame:
    """Chi-square test of independence between two categoricals:
    → one row per observed contingency cell (a, b, observed,
    expected_q, contrib_q) plus the grand-total row (a = b = NULL)
    carrying the statistic Σ contrib_q and the degrees of freedom —
    drift / segmentation-significance audit for pipeline intake.

    Identity used: (o − r·c/N)² / (r·c/N) = (o·N − r·c)² / (r·c·N).
    o·N, r·c and r·c·N are exact in int64 up to ~1e9-row inputs; the
    square and division run in double (exact-int operands ⇒ IEEE
    deterministic), and each CELL's contribution is quantized to an
    int64 at ``out_scale`` BEFORE summing, so the total is an
    order-independent integer sum — hash-stable across engines and
    partition counts.

    One scan: cell counts via groupBy(a, b); row/col/grand totals are
    re-aggregations of that (tiny) cell table, joined back — no second
    pass over the data, no windows, no collects. The cell table is
    localCheckpoint-ed to make the one-scan claim TRUE in the
    executed plan: its five consumers (row/col/grand marginals, the
    joined per-cell frame, dof) each re-evaluated the scan+groupBy
    subtree otherwise (measured 20 static scans for this 1-row-per-
    cell answer).
    """
    # categorical labels travel as strings so the grand-total row's
    # NULL markers union cleanly for any input type
    cells = (
        df.groupBy(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    # marginals re-attach with NULL-SAFE keys: a NULL category is a
    # legitimate level (it is counted in r_tot/c_tot/n_tot), and a
    # plain equi-join would drop its cells from the per-cell output
    # while the totals still include them — an internally
    # inconsistent statistic. eqNullSafe keeps the hash-join shape;
    # the marginal key columns are renamed so the self-derived
    # lineage resolves unambiguously. (The grand-total row is still
    # identified by its non-null ``dof``, not by a = b = NULL.)
    rows = cells.groupBy("a").agg(F.sum("o").alias("r_tot")).select(
        F.col("a").alias("__ra"), "r_tot"
    )
    colst = cells.groupBy("b").agg(F.sum("o").alias("c_tot")).select(
        F.col("b").alias("__cb"), "c_tot"
    )
    grand = cells.select(F.sum("o").alias("n_tot"))
    j = (
        cells.join(rows, F.col("a").eqNullSafe(F.col("__ra")))
        .join(colst, F.col("b").eqNullSafe(F.col("__cb")))
        .drop("__ra", "__cb")
        .crossJoin(F.broadcast(grand))
    )
    num = (F.col("o") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")).cast(
        "double"
    )
    den = (F.col("r_tot") * F.col("c_tot") * F.col("n_tot")).cast("double")
    scale = F.lit(float(out_scale))
    per_cell = j.select(
        "a",
        "b",
        F.col("o").alias("observed"),
        # expected count r·c/N, quantized (exact-int operands)
        F.floor(
            (F.col("r_tot") * F.col("c_tot")).cast("double")
            / F.col("n_tot").cast("double")
            * scale
            + F.lit(0.5)
        )
        .cast("long")
        .alias("expected_q"),
        F.floor(num * num / den * scale + F.lit(0.5))
        .cast("long")
        .alias("contrib_q"),
    )
    dof = (
        rows.select(F.count(F.lit(1)).alias("nr"))
        .crossJoin(colst.select(F.count(F.lit(1)).alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("d"))
    )
    total = per_cell.agg(
        F.sum("observed").alias("observed"),
        F.sum("expected_q").alias("expected_q"),
        F.sum("contrib_q").alias("contrib_q"),
    ).crossJoin(F.broadcast(dof)).select(
        F.lit(None).cast("string").alias("a"),
        F.lit(None).cast("string").alias("b"),
        "observed",
        "expected_q",
        "contrib_q",
        F.col("d").alias("dof"),
    )
    return per_cell.withColumn("dof", F.lit(None).cast("long")).unionByName(
        total
    )


def partition_checksums(
    df: DataFrame, part: Column, row_repr: Column
) -> DataFrame:
    """Per-partition content signatures for cheap snapshot diffing:
    → (part, n_rows, xor_sig) with xor_sig = bit-XOR of a stable
    60-bit row hash. XOR is commutative/associative with no overflow,
    so the signature is partition-order-independent and mergeable;
    two snapshot versions diff by comparing this (tiny) table instead
    of the data — the incremental-validation primitive behind
    "which day-partitions changed since the last run".

    Caveat by construction (document, don't hide): XOR cancels PAIRS
    of identical rows, so ``row_repr`` should include a row identity
    (a key column), making duplicate full rows impossible; n_rows
    also guards the trivial collision. One hash agg, map-side
    combined; shuffle = one row per partition key.
    """
    from det_module_spark.operators.dedup import stable_hash64

    return df.groupBy(part.alias("part")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(stable_hash64(row_repr)).alias("xor_sig"),
    )


def pr_curve(
    df: DataFrame,
    score: Column,
    label: Column,
    thresholds: list[int],
) -> DataFrame:
    """Precision/recall sweep of a quality score against a binary
    label: → one row per threshold (threshold, tp, fp, fn,
    precision_ppm, recall_ppm) with predicted-positive = score ≥ t.
    The calibration table a pipeline reads before picking its quality
    filter cutoff — ppm values are exact integer divisions, so the
    curve is engine-reproducible.

    One pass: each row explodes to |thresholds| tagged copies
    (bounded fan-out; map-side combine folds to |thresholds| cells
    per partition before the shuffle), then one hash agg.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    tagged = df.select(
        score.cast("long").alias("s"), label.cast("long").alias("y")
    ).select(
        "s",
        "y",
        F.explode(
            F.array(*[F.lit(int(t)) for t in sorted(thresholds)])
        ).alias("threshold"),
    )
    pred = (F.col("s") >= F.col("threshold")).cast("long")
    g = tagged.select("threshold", "y", pred.alias("p")).groupBy(
        "threshold"
    ).agg(
        F.sum(F.col("p") * F.col("y")).alias("tp"),
        F.sum(F.col("p") * (1 - F.col("y"))).alias("fp"),
        F.sum((1 - F.col("p")) * F.col("y")).alias("fn"),
    )
    return g.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("tp * 1000000 div (tp + fp)"),
        ).alias("precision_ppm"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr("tp * 1000000 div (tp + fn)"),
        ).alias("recall_ppm"),
    )


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Mutual information between two categoricals, exact to the
    1e-9 ln quantum: → one row (n, mi_num_q) where mi_num_q =
    Σ_cells c_ab·(lnq(c_ab) + lnq(N) − lnq(c_a) − lnq(c_b)) — i.e.
    N·MI in 1e-9 nat units, left as the exact integer numerator so
    no float division ever happens (consumers divide by N at
    display time). The feature-selection companion to
    chi_square_independence: MI ranks how much a column tells you
    about the label.

    Same single-scan shape as chi-square: cell counts, two marginal
    re-aggregations of the (tiny) cell table, one weighted sum. Every
    ln lands in int64 BEFORE the weighted sum (playbook #8/#9).
    """
    from det_module_spark.operators.nbayes import _lnq

    cells = df.groupBy(
        F.col(col_a).cast("string").alias("a"),
        F.col(col_b).cast("string").alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # null-safe marginal re-attach, for the same reason as
    # chi_square_independence: NULL is a counted level, and an
    # equi-join would drop its cells from the weighted sum while n
    # still includes their rows — an understated MI
    ra = cells.groupBy("a").agg(F.sum("c").alias("ca")).select(
        F.col("a").alias("__ra"), "ca"
    )
    rb = cells.groupBy("b").agg(F.sum("c").alias("cb")).select(
        F.col("b").alias("__rb"), "cb"
    )
    n = cells.select(F.sum("c").alias("n"))
    j = (
        cells.join(ra, F.col("a").eqNullSafe(F.col("__ra")))
        .join(rb, F.col("b").eqNullSafe(F.col("__rb")))
        .drop("__ra", "__rb")
        .crossJoin(F.broadcast(n))
    )
    term = F.col("c") * (
        _lnq(F.col("c"))
        + _lnq(F.col("n"))
        - _lnq(F.col("ca"))
        - _lnq(F.col("cb"))
    )
    return j.agg(
        F.max("n").alias("n"), F.sum(term).alias("mi_num_q")
    )


def ks_drift(
    df: DataFrame, stratum: str, is_a: Column, value: Column
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance per stratum:
    → (stratum, n_a, n_b, d_num, d_ppm) where the KS statistic D =
    d_num / (n_a·n_b) and d_ppm = 1e6·d_num div (n_a·n_b). The
    distribution-shape drift test beside psi_drift's binned view —
    KS needs no binning choice and is exact here: D's sup runs over
    sample points, and |cumA·n_b − cumB·n_a| is pure int64 (keep
    n_a·n_b ≤ ~9e12 per stratum; subsample beyond).

    Shape: one (stratum, value) count agg, one per-stratum cumulative
    window over distinct values (sorts only inside the stratum), one
    max agg. ``value`` must be integer-valued (quantize first).
    """
    base = df.select(
        F.col(stratum).alias("stratum"),
        is_a.alias("ia"),
        value.cast("long").alias("x"),
    )
    counts = base.groupBy("stratum", "x").agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("ia"), 1).otherwise(0)).alias("cb"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("stratum").orderBy("x")
    cum = counts.select(
        "stratum",
        F.sum("ca").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cuma"
        ),
        F.sum("cb").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cumb"
        ),
    )
    tot = counts.groupBy("stratum").agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    d = (
        cum.join(tot, "stratum")
        .select(
            "stratum",
            "n_a",
            "n_b",
            F.abs(
                F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a")
            ).alias("gap"),
        )
        .groupBy("stratum", "n_a", "n_b")
        .agg(F.max("gap").alias("d_num"))
    )
    return d.where((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "stratum",
        "n_a",
        "n_b",
        "d_num",
        F.expr("d_num * 1000000 div (n_a * n_b)").alias("d_ppm"),
    )


def wasserstein_drift(
    df: DataFrame, stratum: str, is_a: Column, value: Column
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two samples
    per stratum: → (stratum, n_a, n_b, w1_num, w1_milli) where
    W₁ = w1_num / (n_a·n_b) = ∫|F_A − F_B| over the value axis,
    computed as Σ over consecutive distinct sample values of
    |cumA·n_b − cumB·n_a| · (next_v − v) — pure int64 end to end.

    KS (ks_drift) reports the WORST cdf gap; W₁ integrates the gap,
    so it sees magnitude: a constant +10-unit shift moves W₁ by 10
    but barely moves KS on wide distributions. Use both. w1_milli =
    1000·w1_num div (n_a·n_b) expresses the distance in
    thousandths of a value unit. Keep max|value|·n_a·n_b inside
    int64 — rescale the measure beyond.

    Same shape as ks_drift: one (stratum, value) count agg, one
    per-stratum cumulative+lead window, one sum agg.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(stratum).alias("stratum"),
        is_a.alias("ia"),
        value.cast("long").alias("x"),
    )
    counts = base.groupBy("stratum", "x").agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("ia"), 1).otherwise(0)).alias("cb"),
    )
    w = Window.partitionBy("stratum").orderBy("x")
    cum = counts.select(
        "stratum",
        "x",
        F.sum("ca").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cuma"
        ),
        F.sum("cb").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cumb"
        ),
        F.lead("x").over(w).alias("next_x"),
    )
    tot = counts.groupBy("stratum").agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    seg = (
        cum.where(F.col("next_x").isNotNull())
        .join(tot, "stratum")
        .select(
            "stratum",
            "n_a",
            "n_b",
            (
                F.abs(
                    F.col("cuma") * F.col("n_b")
                    - F.col("cumb") * F.col("n_a")
                )
                * (F.col("next_x") - F.col("x"))
            ).alias("term"),
        )
    )
    agg = seg.groupBy("stratum", "n_a", "n_b").agg(
        F.sum("term").alias("w1_num")
    )
    return agg.where((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "stratum",
        "n_a",
        "n_b",
        "w1_num",
        F.expr("(1000 * w1_num) div (n_a * n_b)").alias("w1_milli"),
    )
