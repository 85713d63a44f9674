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
