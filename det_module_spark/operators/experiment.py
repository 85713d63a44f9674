"""Experimentation analytics: CUPED variance reduction.

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.,
WSDM 2013) is the standard trick for shrinking A/B-test confidence
intervals: regress the experiment-period metric Y on the
pre-experiment metric X of the same unit and analyze the residual
Y − θ·X, θ = Cov(X,Y)/Var(X). The achievable variance reduction is
exactly corr(X,Y)² — the diagnostic this operator reports, so an
experimenter can see per stratum how much a covariate buys BEFORE
wiring it into the analysis.

Exact-moment discipline (ROUND_NOTES playbook #8): everything through
the moment sums is int64 — Σx, Σy, Σxy, Σx², Σy² over integer unit
metrics are order- and partition-independent, so the result is
bit-stable across engines and cluster layouts. The final θ and corr²
are fixed scalar double expressions over those exact moments (IEEE
division/floor is deterministic; no float SUM anywhere).

Scale: one groupBy(unit) count agg + one groupBy(stratum) moments agg
— two shuffles, both map-side-combinable, no window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cuped_report(
    df: DataFrame,
    stratum: str,
    unit: str,
    is_pre: Column,
    weight: Column | None = None,
) -> DataFrame:
    """Per stratum: CUPED covariate diagnostics from per-unit integer
    metrics X = pre-period weight sum, Y = experiment-period weight
    sum (``weight`` defaults to row count) →
    (stratum, n_units, cov_num, varx_num, vary_num, theta_ppm,
    varred_ppm) where

    - cov_num  = n·Σxy − Σx·Σy      (n² · covariance, exact int64)
    - varx_num = n·Σx² − (Σx)²       (n² · variance,  exact int64)
    - theta_ppm  = ⌊10⁶·cov_num / varx_num + ½⌋
    - varred_ppm = ⌊10⁶·cov_num² / (varx_num·vary_num) + ½⌋ — the
      CUPED variance-reduction fraction corr(X,Y)², in ppm.

    Keep per-unit metrics small enough that n·Σxy < 2⁶³ (counts or
    bounded integer scores; quantize heavy-tailed metrics first).
    """
    w = weight if weight is not None else F.lit(1)
    per_unit = (
        df.select(
            F.col(stratum).alias("stratum"),
            F.col(unit).alias("unit"),
            is_pre.alias("pre"),
            w.cast("long").alias("w"),
        )
        .groupBy("stratum", "unit")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("w")).otherwise(0)).alias(
                "x"
            ),
            F.sum(F.when(~F.col("pre"), F.col("w")).otherwise(0)).alias(
                "y"
            ),
        )
    )
    m = per_unit.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n_units") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n_units") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n_units") * F.col("syy") - F.col("sy") * F.col("sy")
    out = m.select(
        "stratum",
        "n_units",
        cov.alias("cov_num"),
        varx.alias("varx_num"),
        vary.alias("vary_num"),
    )
    theta = F.floor(
        F.lit(1000000.0)
        * F.col("cov_num").cast("double")
        / F.col("varx_num").cast("double")
        + F.lit(0.5)
    ).cast("long")
    varred = F.floor(
        F.lit(1000000.0)
        * F.col("cov_num").cast("double")
        * F.col("cov_num").cast("double")
        / (
            F.col("varx_num").cast("double")
            * F.col("vary_num").cast("double")
        )
        + F.lit(0.5)
    ).cast("long")
    return out.select(
        "stratum",
        "n_units",
        "cov_num",
        "varx_num",
        "vary_num",
        F.when(F.col("varx_num") > 0, theta).alias("theta_ppm"),
        F.when(
            (F.col("varx_num") > 0) & (F.col("vary_num") > 0), varred
        ).alias("varred_ppm"),
    )
