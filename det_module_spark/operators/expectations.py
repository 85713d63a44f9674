"""Declarative data-quality expectations (validation-report op).

The reference validates requests and items procedurally
(queue/processing.py:144-147, extract_check.py:54-57 — reject bad
specs before work starts); a warehouse-scale engine wants the same
idea for DATA: declare per-column rules, evaluate them in ONE pass,
get a machine-readable violations report. This is the
Great-Expectations/dbt-tests shape re-expressed as a single Spark
aggregation.

Scale: every rule compiles to a conditional COUNT aggregate over the
same scan — one job, one shuffle-free partial+final agg regardless of
rule count; nothing is collected but the (n_rules)-row report.
``uniqueness`` is the exception (needs a distinct count) and uses
HLL approx by default at 1000x less shuffle than exact distinct.

Rule forms (dicts, JSON-friendly):
    {"col": "x", "rule": "not_null"}
    {"col": "x", "rule": "unique"}                  # approx by default
    {"col": "x", "rule": "between", "lo": 0, "hi": 100}
    {"col": "x", "rule": "in_set", "values": [...]}
    {"col": "x", "rule": "matches", "pattern": "^[A-Z]+$"}
    {"col": "x", "rule": "max_null_frac", "frac": 0.1}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(df_cols: list[str], rule: dict) -> Column:
    """Boolean Column: row violates the rule (null-safe; a null value
    only violates not_null / max_null_frac rules)."""
    c = F.col(rule["col"])
    kind = rule["rule"]
    if kind == "not_null":
        return c.isNull()
    if kind == "between":
        return c.isNotNull() & ~c.between(F.lit(rule["lo"]), F.lit(rule["hi"]))
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown rule: {kind}")


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate all rules in one aggregation pass.

    Returns (col, rule, n_rows, n_violations, violation_frac, passed)
    — one row per rule. Row-level rules share a single scan; 'unique'
    and 'max_null_frac' compile to aggregate comparisons in the same
    agg. Report rows are built with a rule-index map-side, so the
    whole report is ONE job."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        kind = r["rule"]
        c = F.col(r["col"])
        if kind == "unique":
            # approx (HLL, shuffle-free) by default; {"exact": True}
            # swaps in a true distinct count when the column is a key
            # whose violation count must be exact
            d = (
                F.count_distinct(c)
                if r.get("exact")
                else F.approx_count_distinct(r["col"])
            )
            aggs.append(d.alias(f"_d{i}"))
            aggs.append(F.count(c).alias(f"_c{i}"))
        elif kind == "max_null_frac":
            aggs.append(
                F.count(F.when(c.isNull(), 1)).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.count(F.when(_violation(df.columns, r), 1)).alias(f"_v{i}")
            )
    agg = df.agg(*aggs)

    # one row -> array of per-rule report structs -> explode: the agg
    # subtree exists ONCE in the plan (a union of selects would
    # re-evaluate it per rule)
    structs = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "unique":
            # violations ≈ non-null rows minus distinct values
            viol = F.greatest(
                F.col(f"_c{i}") - F.col(f"_d{i}"), F.lit(0)
            ).cast("long")
        else:
            viol = F.col(f"_v{i}").cast("long")
        frac = F.when(
            F.col("_n") > 0, viol.cast("double") / F.col("_n")
        ).otherwise(F.lit(0.0))
        threshold = float(r.get("frac", 0.0))
        structs.append(
            F.struct(
                F.lit(r["col"]).alias("col"),
                F.lit(kind).alias("rule"),
                F.col("_n").alias("n_rows"),
                viol.alias("n_violations"),
                frac.alias("violation_frac"),
                (frac <= F.lit(threshold)).alias("passed"),
            )
        )
    return agg.select(
        F.explode(F.array(*structs)).alias("r")
    ).select("r.*")


def windowed_expectations(
    df: DataFrame,
    rules: list[dict],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Data-quality over TIME WINDOWS — the streaming twin of
    expectations_report. Row-level rules compile to the same
    conditional counts, grouped by a tumbling event-time window, so
    the identical expression works on a batch frame and on a
    readStream frame (with ``watermark`` set, the aggregation is an
    incremental streaming state machine emitting finalized windows).
    'unique' is not meaningful per-row-window here and is rejected.

    Output: (window_start, window_end, col, rule, n_rows,
    n_violations) — long-form, one row per (window, rule)."""
    for r in rules:
        if r["rule"] == "unique":
            raise ValueError("'unique' is not supported in windowed mode")
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        c = F.col(r["col"])
        if r["rule"] == "max_null_frac":
            cond = c.isNull()
        else:
            cond = _violation(df.columns, r)
        aggs.append(F.count(F.when(cond, 1)).alias(f"_v{i}"))
    agg = df.groupBy(F.window(ts_col, window).alias("w")).agg(*aggs)
    structs = [
        F.struct(
            F.lit(r["col"]).alias("col"),
            F.lit(r["rule"]).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v{i}").cast("long").alias("n_violations"),
        )
        for i, r in enumerate(rules)
    ]
    return agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        F.explode(F.array(*structs)).alias("r"),
    ).select("window_start", "window_end", "r.*")
