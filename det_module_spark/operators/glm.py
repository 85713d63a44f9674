"""Distributed GLM: logistic regression by fixed Newton rounds.

The missing "train a simple model IN the engine" capability: logistic
regression on (1, x1, x2) with K Newton-Raphson rounds, each round
one aggregation over the data — the textbook IRLS update

    β' = β + H⁻¹ g,   g = Σ (y − p)·x,   H = Σ p(1−p)·x xᵀ

Determinism discipline (the repo's exact-moment playbook applied to a
float algorithm):
- β is carried QUANTIZED (1e-9 longs), so every round starts from a
  bit-exact state on every engine;
- per-row gradient/Hessian terms are computed in IEEE double from
  that exact state, then QUANTIZED to 1e-6 longs BEFORE the sum —
  int64 sums are order- and partition-independent, which is what
  makes a fixed round count reproducible (a raw double sum would
  drift with partitioning);
- the 3×3 Newton solve is closed-form adjugate/determinant scalar
  arithmetic on the exact sums — deterministic IEEE, no library
  solver.

The WHOLE fit is one SQL text (``logreg_sql``) with no dialect
constructs — FLOOR/EXP/CASE/CAST only — so Spark executes it via
``spark.sql`` (Catalyst plans each round as one partial+final agg
over the feature scan; the 1-row β frame cross-joins back, which AQE
broadcasts) and DuckDB executes the IDENTICAL text as the oracle.
Scale: K aggregations over n rows; no collect, no UDF, no iteration
state outside the 1-row β relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_BETA = "1000000000.0"  # β carried in 1e-9 units
Q_TERM = "1000000.0"  # per-row moment terms quantized to 1e-6


def _round_ctes(i: int) -> str:
    """CTEs for Newton round i: probabilities from b{i-1}, quantized
    moment sums, closed-form solve into b{i}."""
    z = (
        f"((CAST(b0 AS DOUBLE) + CAST(b1 AS DOUBLE) * xd1"
        f" + CAST(b2 AS DOUBLE) * xd2) / {Q_BETA})"
    )
    p = f"(1.0 / (1.0 + EXP(-{z})))"

    def qsum(expr: str, alias: str) -> str:
        return (
            f"CAST(SUM(CAST(FLOOR(({expr}) * {Q_TERM} + 0.5)"
            f" AS BIGINT)) AS BIGINT) AS {alias}"
        )

    r = "(yd - p)"
    w = "(p * (1.0 - p))"
    sums = ",\n         ".join(
        [
            qsum(f"{r}", "g0q"),
            qsum(f"{r} * xd1", "g1q"),
            qsum(f"{r} * xd2", "g2q"),
            qsum(f"{w}", "h00q"),
            qsum(f"{w} * xd1", "h01q"),
            qsum(f"{w} * xd2", "h02q"),
            qsum(f"{w} * xd1 * xd1", "h11q"),
            qsum(f"{w} * xd1 * xd2", "h12q"),
            qsum(f"{w} * xd2 * xd2", "h22q"),
        ]
    )
    unq = "\n         ".join(
        f"CAST({a}q AS DOUBLE) / {Q_TERM} AS {a},"
        for a in ["g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22"]
    )
    return f"""
p{i} AS (
  SELECT yd, xd1, xd2, {p} AS p
  FROM feat CROSS JOIN b{i - 1}),
s{i} AS (
  SELECT {sums}
  FROM p{i}),
m{i} AS (
  SELECT {unq}
         1 AS one
  FROM s{i}),
a{i} AS (
  SELECT g0, g1, g2, h00, h01, h02,
         h11 * h22 - h12 * h12 AS a00,
         h02 * h12 - h01 * h22 AS a01,
         h01 * h12 - h02 * h11 AS a02,
         h00 * h22 - h02 * h02 AS a11,
         h01 * h02 - h00 * h12 AS a12,
         h00 * h11 - h01 * h01 AS a22
  FROM m{i}),
d{i} AS (
  SELECT g0, g1, g2, a00, a01, a02, a11, a12, a22,
         h00 * a00 + h01 * a01 + h02 * a02 AS det
  FROM a{i}),
b{i} AS (
  SELECT
    b0 + CAST(FLOOR((a00 * g0 + a01 * g1 + a02 * g2) / det
         * {Q_BETA} + 0.5) AS BIGINT) AS b0,
    b1 + CAST(FLOOR((a01 * g0 + a11 * g1 + a12 * g2) / det
         * {Q_BETA} + 0.5) AS BIGINT) AS b1,
    b2 + CAST(FLOOR((a02 * g0 + a12 * g1 + a22 * g2) / det
         * {Q_BETA} + 0.5) AS BIGINT) AS b2
  FROM d{i} CROSS JOIN b{i - 1})"""


def logreg_sql(feat_sql: str, rounds: int = 3) -> str:
    """Full fit as one dialect-free SQL text. ``feat_sql`` must
    produce columns (yd DOUBLE ∈ {0,1}, xd1 DOUBLE, xd2 DOUBLE).
    Returns 3 rows (coef, beta_q) with β in 1e-9 units.

    Degenerate-input contract (DIVERGES from the driver path, by
    design): ``_solve_round`` raises ValueError on an empty feature
    frame (NULL moment sums) or a singular Hessian (det = 0), because
    the driver can fail loudly. This SQL text cannot raise — an empty
    frame propagates NULL β through every round and returns 3 NULL
    coefficient rows; a zero determinant divides by 0 (NULL in Spark
    non-ANSI, an error in DuckDB). The identical-expression parity
    guarantee applies to NON-degenerate inputs only."""
    sql = f"""WITH feat AS ({feat_sql}),
b0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,
              CAST(0 AS BIGINT) AS b2)"""
    for i in range(1, rounds + 1):
        sql += "," + _round_ctes(i)
    last = f"b{rounds}"
    return (
        sql
        + f"""
SELECT 'b0' AS coef, b0 AS beta_q FROM {last}
UNION ALL SELECT 'b1', b1 FROM {last}
UNION ALL SELECT 'b2', b2 FROM {last}
ORDER BY coef"""
    )


def _moment_exprs(b: list[int]) -> list[str]:
    """The nine quantized moment aggregates for the CURRENT quantized
    beta embedded as literals — the same expression trees as
    ``_round_ctes`` (CAST(<int> AS DOUBLE) replaces the column ref)."""
    z = (
        f"((CAST({b[0]} AS DOUBLE) + CAST({b[1]} AS DOUBLE) * xd1"
        f" + CAST({b[2]} AS DOUBLE) * xd2) / {Q_BETA})"
    )
    p = f"(1.0 / (1.0 + EXP(-{z})))"
    r = f"(yd - {p})"
    w = f"({p} * (1.0 - {p}))"
    pairs = [
        (r, "g0q"), (f"{r} * xd1", "g1q"), (f"{r} * xd2", "g2q"),
        (w, "h00q"), (f"{w} * xd1", "h01q"), (f"{w} * xd2", "h02q"),
        (f"{w} * xd1 * xd1", "h11q"), (f"{w} * xd1 * xd2", "h12q"),
        (f"{w} * xd2 * xd2", "h22q"),
    ]
    return [
        f"CAST(SUM(CAST(FLOOR(({e}) * {Q_TERM} + 0.5) AS BIGINT))"
        f" AS BIGINT) AS {a}"
        for e, a in pairs
    ]


def _solve_round(b: list[int], row) -> list[int]:
    """Newton update from the nine exact integer sums — the IDENTICAL
    IEEE expression sequence as the SQL solve in ``_round_ctes``
    (proven equal by tests/test_wave23_glm.py), evaluated on the
    driver. Control plane: consumes one 1-row aggregate.

    Degenerate inputs fail loudly here instead of deep in
    ``math.floor``: an empty feature frame aggregates to NULL sums,
    and a singular Hessian (constant or collinear features, or an
    all-0/all-1 label at an extreme β) has det = 0 — both would
    otherwise surface as TypeError/OverflowError three frames down."""
    import math

    if row["h00q"] is None:
        raise ValueError("logreg fit: empty feature frame (no rows)")
    qt = float(Q_TERM)
    g0, g1, g2 = (row[k] / qt for k in ("g0q", "g1q", "g2q"))
    h00, h01, h02, h11, h12, h22 = (
        row[k] / qt
        for k in ("h00q", "h01q", "h02q", "h11q", "h12q", "h22q")
    )
    a00 = h11 * h22 - h12 * h12
    a01 = h02 * h12 - h01 * h22
    a02 = h01 * h12 - h02 * h11
    a11 = h00 * h22 - h02 * h02
    a12 = h01 * h02 - h00 * h12
    a22 = h00 * h11 - h01 * h01
    det = h00 * a00 + h01 * a01 + h02 * a02
    if det == 0.0:
        raise ValueError(
            "logreg fit: singular Hessian (constant or collinear "
            "features); Newton step undefined"
        )
    qb = float(Q_BETA)
    return [
        b[0] + math.floor((a00 * g0 + a01 * g1 + a02 * g2) / det * qb + 0.5),
        b[1] + math.floor((a01 * g0 + a11 * g1 + a12 * g2) / det * qb + 0.5),
        b[2] + math.floor((a02 * g0 + a12 * g1 + a22 * g2) / det * qb + 0.5),
    ]


def _fit_beta(feat: DataFrame, rounds: int) -> list[int]:
    b = [0, 0, 0]
    for _ in range(rounds):
        row = feat.selectExpr(*_moment_exprs(b)).collect()[0]
        b = _solve_round(b, row)
    return b


def _feat_frame(df: DataFrame, y: str, x1: str, x2: str) -> DataFrame:
    return df.selectExpr(
        f"CAST({y} AS DOUBLE) AS yd",
        f"CAST({x1} AS DOUBLE) AS xd1",
        f"CAST({x2} AS DOUBLE) AS xd2",
    )


def logreg_fit(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str,
    rounds: int = 3,
) -> DataFrame:
    """DataFrame wrapper: one aggregation job per Newton round (K
    scans of the data total), β advanced on the driver from the 1-row
    moment aggregate — NOT the unrolled-CTE plan, which Catalyst
    expands into 2^K re-scans of the input (each round references the
    previous β twice); the unrolled text remains the DuckDB oracle and
    is value-identical by construction (same quantized state, same
    IEEE solve — asserted in tests)."""
    spark = df.sparkSession
    feat = _feat_frame(df, y, x1, x2)
    b = _fit_beta(feat, rounds)
    return spark.createDataFrame(
        [("b0", b[0]), ("b1", b[1]), ("b2", b[2])], ["coef", "beta_q"]
    ).orderBy("coef")


def logreg_calibration_sql(
    feat_sql: str, rounds: int = 3, bins: int = 10
) -> str:
    """Train + evaluate in one dialect-free SQL text: fit as in
    ``logreg_sql``, score every row with the final β, bucket by
    predicted probability and report the reliability diagram —
    (bin, n, pred_ppm, obs_ppm). A calibrated model has
    pred_ppm ≈ obs_ppm per bin; the spread is the miscalibration.

    Same determinism rules: per-row predicted probs are quantized to
    1e-6 longs before the per-bin sums; the two ppm averages are
    FLOOR'd IEEE divisions of exact ints."""
    base = logreg_sql(feat_sql, rounds)
    # strip the final projection; keep the CTE chain
    chain = base[: base.rindex("\nSELECT 'b0'")]
    z = (
        f"((CAST(b0 AS DOUBLE) + CAST(b1 AS DOUBLE) * xd1"
        f" + CAST(b2 AS DOUBLE) * xd2) / {Q_BETA})"
    )
    p = f"(1.0 / (1.0 + EXP(-{z})))"
    return (
        chain
        + f""",
score AS (
  SELECT yd, {p} AS p
  FROM feat CROSS JOIN b{rounds}),
binned AS (
  SELECT CAST(LEAST(FLOOR(p * {bins}.0), {bins - 1}) AS BIGINT)
           AS bin,
         CAST(FLOOR(p * {Q_TERM} + 0.5) AS BIGINT) AS pq,
         CAST(yd AS BIGINT) AS yb
  FROM score)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(CAST(SUM(pq) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS pred_ppm,
       CAST(FLOOR({Q_TERM} * CAST(SUM(yb) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS obs_ppm
FROM binned GROUP BY bin ORDER BY bin"""
    )


def logreg_calibrate(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str,
    rounds: int = 3,
    bins: int = 10,
) -> DataFrame:
    """Fit (K aggregation jobs, see logreg_fit) then ONE scoring pass
    bucketing predictions with the final β as literals — K+1 scans
    total vs the unrolled plan's exponential re-scan."""
    feat = _feat_frame(df, y, x1, x2)
    b = _fit_beta(feat, rounds)
    z = (
        f"((CAST({b[0]} AS DOUBLE) + CAST({b[1]} AS DOUBLE) * xd1"
        f" + CAST({b[2]} AS DOUBLE) * xd2) / {Q_BETA})"
    )
    p = f"(1.0 / (1.0 + EXP(-{z})))"
    binned = feat.selectExpr(
        f"CAST(LEAST(FLOOR({p} * {bins}.0), {bins - 1}) AS BIGINT)"
        " AS bin",
        f"CAST(FLOOR({p} * {Q_TERM} + 0.5) AS BIGINT) AS pq",
        "CAST(yd AS BIGINT) AS yb",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(
                "CAST(FLOOR(CAST(SUM(pq) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
            ).alias("pred_ppm"),
            F.expr(
                f"CAST(FLOOR({Q_TERM} * CAST(SUM(yb) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
            ).alias("obs_ppm"),
        )
        .orderBy("bin")
    )
