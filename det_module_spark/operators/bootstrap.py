"""Poisson-bootstrap confidence intervals — the eval primitive.

Classic bootstrap resamples n rows with replacement B times, which is
un-distributable (each resample needs global coordination). The
Poisson bootstrap replaces the multinomial row counts with independent
Poisson(1) weights per (row, replicate) — one streaming pass, no
resampling, statistically equivalent for large n (public folklore
since Oza & Russell's online bagging / Chamandy et al.'s "Estimating
Uncertainty for Massive Data Streams" formulation).

Determinism: the Poisson draw inverts the CDF over a uniform derived
from md5(key:b) (the repo's hash-sampling convention), so every
replicate is reproducible across runs, partitionings, and engines —
the DuckDB oracle replays the exact weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from det_module_spark.operators.dedup import stable_hash64

_RES = 1_000_000
# floor(CDF_Poisson(1)(k) * 1e6) for k = 0..5; u >= the last threshold
# draws weight 6 (mass 6e-5 — negligible and exactly mirrored in SQL)
POISSON1_CDF_Q = [367879, 735758, 919698, 981011, 996340, 999405]


def _poisson1_weight(u: Column) -> Column:
    w = F.lit(len(POISSON1_CDF_Q))
    for k in range(len(POISSON1_CDF_Q) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF_Q[k], k).otherwise(w)
    return w


def poisson_weight_sql(u_expr: str) -> str:
    """DuckDB CASE mirroring :func:`_poisson1_weight`."""
    arms = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}"
        for k, t in enumerate(POISSON1_CDF_Q)
    )
    return f"CASE {arms} ELSE {len(POISSON1_CDF_Q)} END"


def bootstrap_mean_ci(
    df: DataFrame,
    key: Column,
    value: Column,
    b: int = 40,
    seed: str = "boot",
) -> DataFrame:
    """Bootstrap CI for the mean of an integer ``value``: → one row
    (n_boot, point_c, lo_c, hi_c) with point_c = Σx div n over the
    full sample and lo_c/hi_c the 2nd-smallest / 2nd-largest replicate
    means. At B = 40 the rank-2 order statistics sit near the
    3.75%/96.25% points (Hazen plotting position (rank−0.5)/B; the
    rank/(B+1) convention gives 4.9%/95.1%), so the interval is
    ~92% two-sided — slightly wider than a nominal 90%. For an exact
    nominal level swap the rank-2 filters for rank ceil(0.05·B) /
    B+1−ceil(0.05·B), or raise B.

    Shape: one explode to B replicate tags per row, Poisson(1) weights
    from a per-(row, replicate) uniform, ONE hash aggregation to B
    cells — map-side combine reduces the shuffle to B rows per
    partition, so the ×B fan-out never reaches the wire. The
    order-statistics window runs over the B-row replicate frame. All
    arithmetic integer: replicate mean = Σ(w·x) div Σw, ties on
    (mean, replicate id).

    The per-replicate uniforms come from ONE md5 per row pushed
    through the repo's seeded universal-hash family ((aᵦ·h + bᵦ) mod
    P, the MinHash constants): B md5 calls per row was the single
    most expensive query in the sf0.1 bench (~40× the hash work for
    no statistical gain), and the family is already the established
    replicate-stream construction here.
    """
    from det_module_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    if b > len(MINHASH_A):
        raise ValueError(f"b must be <= {len(MINHASH_A)}")
    tagged = df.select(
        (
            stable_hash64(
                F.concat(F.lit(f"{seed}:"), key.cast("string"))
            )
            % MINHASH_P
        ).alias("h"),
        value.cast("long").alias("x"),
    ).select(
        "h", "x", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rb")
    )
    a_arr = F.array(*[F.lit(a) for a in MINHASH_A[:b]])
    b_arr = F.array(*[F.lit(c) for c in MINHASH_B[:b]])
    u = (
        F.element_at(a_arr, F.col("rb") + 1) * F.col("h")
        + F.element_at(b_arr, F.col("rb") + 1)
    ) % MINHASH_P % _RES
    cells = (
        tagged.withColumn("w", _poisson1_weight(u))
        .groupBy("rb")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select("rb", F.expr("swx div sw").alias("mean_c"))
        # the B-row replicate frame feeds three consumers (count, lo,
        # hi); materialize it once or each re-runs the n·B-row agg
        .localCheckpoint(eager=True)
    )
    wlo = Window.orderBy(F.asc("mean_c"), F.asc("rb"))
    whi = Window.orderBy(F.desc("mean_c"), F.desc("rb"))
    ranked = cells.select(
        "mean_c",
        F.row_number().over(wlo).alias("rn_asc"),
        F.row_number().over(whi).alias("rn_desc"),
    )
    n_boot = ranked.agg(F.count(F.lit(1)).alias("n_boot"))
    lo = ranked.where(F.col("rn_asc") == 2).select(
        F.col("mean_c").alias("lo_c")
    )
    point = df.select(value.cast("long").alias("x")).agg(
        F.expr("sum(x) div count(1)").alias("point_c")
    )
    hi = ranked.where(F.col("rn_desc") == 2).select(
        F.col("mean_c").alias("hi_c")
    )
    return (
        n_boot.crossJoin(point).crossJoin(lo).crossJoin(hi).select(
            "n_boot", "point_c", "lo_c", "hi_c"
        )
    )
