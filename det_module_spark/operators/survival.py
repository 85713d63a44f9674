"""Survival analysis: the Kaplan-Meier product-limit estimator.

Churn/retention questions are survival questions: "what fraction of
users is still active t days after their first touch, given that many
users are still alive (right-censored) when we look?". Averaging
naively over churned users biases the curve; KM handles censoring by
multiplying conditional survival over the observed event times:

    S(t) = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i)

with d_i deaths at time t_i and n_i the at-risk count (units whose
observed lifetime is ≥ t_i, churned or censored).

Cross-engine determinism: the product is carried in LOG space as an
integer — per event time, term = ⌊10⁶·ln((n_i−d_i)/n_i) + ½⌋ (the
ln input is an exact-int64 ratio evaluated in IEEE double, and ln
hash-matched across Spark/DuckDB at this quantization in rounds 1-5,
see ROUND_NOTES playbook #9) — and the cumulative sum of int64 terms
is order-independent. ``surv_ppm`` re-exponentiates the integer log.

Extinction (d_i = n_i, survival hits exactly 0, ln → −∞) rows are
excluded from the curve and reported via the at-risk/death counts
only — the standard presentation stops the curve there anyway.

Shape: one per-unit agg, one (cohort, lifetime) agg, one descending
cumulative window for the at-risk counts, one cumulative window for
the log survival. No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    cohort: Column,
    unit: str,
    day: Column,
    horizon_days: int = 3,
) -> DataFrame:
    """KM survival per cohort from raw activity rows →
    (cohort, t, n_risk, n_events, ln_s_micro, surv_ppm), rows at
    death times only (n_events > 0, extinction row excluded).

    ``day`` must be an integer day index (e.g. datediff from epoch);
    lifetime = last active day − first active day. A unit is a DEATH
    when its last activity is ≥ ``horizon_days`` before the global
    max day (we watched long enough to call the silence churn),
    otherwise it is censored at its observed lifetime.
    """
    from pyspark.sql import Window

    per_unit = (
        df.select(cohort.alias("cohort"), F.col(unit).alias("u"), day.alias("d"))
        .groupBy("cohort", "u")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
    )
    max_day = per_unit.agg(F.max("last_d").alias("mx"))
    lifetimes = per_unit.crossJoin(F.broadcast(max_day)).select(
        "cohort",
        (F.col("last_d") - F.col("first_d")).alias("t"),
        (F.col("last_d") + horizon_days <= F.col("mx"))
        .cast("long")
        .alias("dead"),
    )
    cells = lifetimes.groupBy("cohort", "t").agg(
        F.count(F.lit(1)).alias("ending"),
        F.sum("dead").alias("n_events"),
    )
    w_desc = (
        Window.partitionBy("cohort")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = cells.select(
        "cohort",
        "t",
        "n_events",
        F.sum("ending").over(w_desc).alias("n_risk"),
    )
    term = F.floor(
        F.lit(1000000.0)
        * F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk").cast("double")
        )
        + F.lit(0.5)
    ).cast("long")
    steps = at_risk.where(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk"))
    ).withColumn("term", term)
    w_asc = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = steps.withColumn("ln_s_micro", F.sum("term").over(w_asc))
    return out.select(
        "cohort",
        "t",
        "n_risk",
        "n_events",
        "ln_s_micro",
        F.floor(
            F.lit(1000000.0)
            * F.exp(F.col("ln_s_micro").cast("double") / F.lit(1000000.0))
            + F.lit(0.5)
        ).cast("long").alias("surv_ppm"),
    )


def logrank_test(
    df: DataFrame,
    cohort: Column,
    unit: str,
    day: Column,
    group_a: str,
    group_b: str,
    horizon_days: int = 3,
) -> DataFrame:
    """Log-rank test between two cohorts' survival curves (the
    companion significance test to ``kaplan_meier``: "is A's churn
    actually different from B's, or noise?").

    At each death time t (pooled): with d deaths of n at risk and
    n_a at risk in A, the A-expectation term is d·n_a/n and the
    hypergeometric variance term d·(n_a/n)·(n_b/n)·(n−d)/(n−1);
    χ² = (O_A − E_A)² / V. O_A is an exact int; the E and V terms are
    quantized to 1e-6 per time point before the int64 sums (order
    independent); the final χ² is one mirrored IEEE expression.
    → one row (group_a, group_b, o_a, e_a_micro, v_micro,
    chi2_milli).

    Shape: same aggs/windows as kaplan_meier over the two-cohort
    subset; one final 1-row reduction."""
    from pyspark.sql import Window

    per_unit = (
        df.select(
            cohort.alias("cohort"), F.col(unit).alias("u"), day.alias("d")
        )
        .where(F.col("cohort").isin(group_a, group_b))
        .groupBy("cohort", "u")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
    )
    max_day = per_unit.agg(F.max("last_d").alias("mx"))
    lifetimes = per_unit.crossJoin(F.broadcast(max_day)).select(
        (F.col("cohort") == group_a).alias("is_a"),
        (F.col("last_d") - F.col("first_d")).alias("t"),
        (F.col("last_d") + horizon_days <= F.col("mx"))
        .cast("long")
        .alias("dead"),
    )
    cells = lifetimes.groupBy("t").agg(
        F.count(F.lit(1)).alias("ending"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ending_a"),
        F.sum("dead").alias("d_all"),
        F.sum(F.when(F.col("is_a"), F.col("dead")).otherwise(0)).alias(
            "d_a"
        ),
    )
    w_desc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = cells.select(
        "t",
        "d_all",
        "d_a",
        F.sum("ending").over(w_desc).alias("n_all"),
        F.sum("ending_a").over(w_desc).alias("n_a"),
    ).where((F.col("d_all") > 0) & (F.col("n_all") > 1))
    e_term = (
        F.col("d_all").cast("double")
        * F.col("n_a").cast("double")
        / F.col("n_all").cast("double")
    )
    v_term = (
        F.col("d_all").cast("double")
        * (F.col("n_a").cast("double") / F.col("n_all").cast("double"))
        * (
            (F.col("n_all") - F.col("n_a")).cast("double")
            / F.col("n_all").cast("double")
        )
        * (
            (F.col("n_all") - F.col("d_all")).cast("double")
            / (F.col("n_all") - 1).cast("double")
        )
    )
    agg = at_risk.agg(
        F.sum("d_a").alias("o_a"),
        F.sum(
            F.floor(e_term * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        ).alias("e_a_micro"),
        F.sum(
            F.floor(v_term * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        ).alias("v_micro"),
    )
    d1 = (F.col("o_a") * F.lit(1000000) - F.col("e_a_micro")).cast(
        "double"
    )
    chi2 = F.floor(
        d1 * d1 * F.lit(1000.0)
        / (F.lit(1000000.0) * F.col("v_micro").cast("double"))
        + F.lit(0.5)
    ).cast("long")
    return agg.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "o_a",
        "e_a_micro",
        "v_micro",
        F.when(F.col("v_micro") > 0, chi2).alias("chi2_milli"),
    )
