"""Privacy operators: deterministic pseudonymization and k-anonymity
auditing.

A training-data pipeline that touches user data needs (a) stable
pseudonyms — the same raw identifier always maps to the same token so
joins/groupings still work, but the raw value never leaves the scan —
and (b) an audit answering "do the quasi-identifier combinations in
this release identify fewer than k individuals?".

Both are pure Column expressions / single aggregations:
- pseudonymize: md5(salt ‖ value) truncated to 16 hex chars, computed
  inside the scan projection (codegen, no Python). Salted so tokens
  are not globally linkable across datasets with different salts;
  rotate the salt to shred linkage (crypto-shredding-lite: without the
  salt the mapping is gone).
- k_anonymity_report: one hash aggregation over the quasi-identifier
  tuple; groups with fewer than k rows are the re-identification risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame, cols: list[str], salt: str, keep_raw: bool = False
) -> DataFrame:
    """Replace each column in ``cols`` with a 16-hex-char salted-hash
    pseudonym (or add ``<col>_pid`` beside it when ``keep_raw``).
    Nulls stay null."""
    out = df
    for c in cols:
        pid = F.when(
            F.col(c).isNotNull(),
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(c).cast("string"))),
                1,
                16,
            ),
        )
        if keep_raw:
            out = out.withColumn(f"{c}_pid", pid)
        else:
            out = out.withColumn(c, pid)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per quasi-identifier combination: → (quasi..., n_rows,
    is_risky) where ``is_risky`` marks groups smaller than ``k``.
    One aggregation; the risky-group count is the release gate."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("is_risky", F.col("n_rows") < k)
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — the companion gate to ``k_anonymity_report``:
    a group can be k-anonymous yet still leak if everyone in it shares
    one sensitive value (homogeneity attack). Per quasi-identifier
    combination → (quasi..., n_rows, n_sensitive, is_risky) where
    ``n_sensitive`` counts DISTINCT sensitive values and ``is_risky``
    marks groups with fewer than ``l`` of them.

    One hash aggregation (count-distinct rewrites to a two-level
    partial agg under whole-stage codegen — no extra shuffle beyond
    the group keys)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .withColumn("is_risky", F.col("n_sensitive") < l)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    seed: str,
    noise_bound: int = 8,
    min_count: int = 10,
) -> DataFrame:
    """Differentially-private-STYLE released counts: per group →
    (group..., noisy_count) where a symmetric integer perturbation in
    [-noise_bound, +noise_bound] is added to the true count and groups
    whose TRUE count is below ``min_count`` are suppressed entirely
    (the standard contribution-bounded histogram release shape).

    The noise here is derived from md5(seed ‖ group-key) — two
    hash-uniforms whose difference is symmetric around 0 — NOT from a
    calibrated Laplace/geometric sampler: determinism is what lets an
    SQL oracle hash-match the release bit-for-bit on another engine.
    A production ε-DP release swaps ``_hash_noise`` for a discrete
    Laplace draw from a secure RNG; everything else (count sensitivity
    1 per contribution, per-group noise, small-group suppression) is
    the real mechanism.

    Scale shape: one hash aggregation + codegen projections. The noise
    expression is pure Column arithmetic (md5/ascii/pmod), so the whole
    release stays JVM-side."""
    key = F.concat_ws(
        "\x1f", F.lit(seed), *[F.col(c).cast("string") for c in group_cols]
    )
    h = F.md5(key.cast("binary"))
    span = noise_bound + 1
    u1 = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 96 + F.ascii(F.substring(h, 2, 1)),
        F.lit(span),
    )
    u2 = F.pmod(
        F.ascii(F.substring(h, 3, 1)) * 96 + F.ascii(F.substring(h, 4, 1)),
        F.lit(span),
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select(
            *group_cols,
            (F.col("__n") + (u1 - u2)).cast("long").alias("noisy_count"),
        )
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column,
    t_ppm: int = 200000,
) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007) for an ORDERED
    sensitive attribute: per quasi-identifier group, the Earth-Mover
    Distance between the group's sensitive-value distribution and the
    whole table's, under the ordered-distance ground metric the paper
    prescribes for numeric attributes:

        EMD(g) = (1/(m−1)) · Σ_{i<m} |CumP_g(i) − CumP_all(i)|

    over the m distinct sensitive levels. k-anonymity bounds group
    SIZE and l-diversity bounds VARIETY; t-closeness is the stricter
    gate — a group can be large and varied yet still leak ("everyone
    in this zip code has unusually low values"). A release passes when
    every group's EMD ≤ t.

    Exact integer arithmetic: with group size n_g, table size N and
    level counts c, CumP_g·N − CumP_all·n_g is int64, so
    emd_num = Σ|cum_g·N − cum_all·n_g| is exact and
    emd_ppm = 10⁶·emd_num div ((m−1)·n_g·N). Keep n_g·N·m inside
    int64 — quantize/clamp the sensitive attribute to a bounded level
    domain first (that clamp, not the data, bounds m).

    Shape: one (group, level) count agg, one per-group cumulative
    window over ≤ m rows per group (after a dense level grid fills
    absent levels with 0 — absent levels still move the cumulative
    gap), one final agg. The level grid is bounded by the clamp, so
    its build side is broadcast-safe by construction.

    → (quasi..., n_rows, emd_num, emd_ppm, is_risky).
    """
    from pyspark.sql import Window

    base = df.select(
        *[F.col(c) for c in quasi_cols], sensitive.alias("lvl")
    ).where(F.col("lvl").isNotNull())
    cells = base.groupBy(*quasi_cols, "lvl").agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = cells.groupBy(*quasi_cols).agg(F.sum("c").alias("n_g"))
    levels = base.groupBy("lvl").agg(F.count(F.lit(1)).alias("c_all"))
    # dense (group × level) grid: bounded by the caller's clamp.
    # The cell re-attach is NULL-SAFE on the quasi columns: a group
    # keyed by a NULL quasi value is a real group (groupBy counted
    # it), and a plain equi-join would match none of its cells — all
    # its counts coalesce to 0 and the group reports a maximal EMD,
    # spuriously flagging it. eqNullSafe keeps the hash-join shape;
    # the cells side is renamed so the self-derived lineage resolves
    # unambiguously (lvl is non-null by the base filter, but joins
    # null-safe for uniformity).
    cells_r = cells.select(
        *[F.col(c).alias(f"__cell_{i}") for i, c in enumerate(quasi_cols)],
        F.col("lvl").alias("__cell_lvl"),
        "c",
    )
    cond = F.col("lvl").eqNullSafe(F.col("__cell_lvl"))
    for i, c in enumerate(quasi_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__cell_{i}"))
    grid = (
        groups.crossJoin(F.broadcast(levels.select("lvl")))
        .join(cells_r, cond, "left")
        .drop(
            *[f"__cell_{i}" for i in range(len(quasi_cols))],
            "__cell_lvl",
        )
    )
    tot = levels.agg(
        F.sum("c_all").alias("n_all"),
        F.count(F.lit(1)).alias("m"),
        F.max("lvl").alias("max_lvl"),
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("lvl")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        grid.join(F.broadcast(levels), "lvl")
        .select(
            *quasi_cols,
            "lvl",
            "n_g",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w).alias(
                "cum_g"
            ),
            F.sum("c_all").over(w).alias("cum_all"),
        )
        .crossJoin(F.broadcast(tot))
    )
    emd = (
        cum.where(F.col("lvl") < F.col("max_lvl"))
        .groupBy(*quasi_cols, "n_g", "n_all", "m")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n_all")
                    - F.col("cum_all") * F.col("n_g")
                )
            ).alias("emd_num")
        )
    )
    return emd.select(
        *quasi_cols,
        F.col("n_g").alias("n_rows"),
        "emd_num",
        F.expr(
            "emd_num * 1000000 div ((m - 1) * n_g * n_all)"
        ).alias("emd_ppm"),
    ).withColumn("is_risky", F.col("emd_ppm") > t_ppm)
