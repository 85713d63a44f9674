"""Preference-log analytics — the descriptive layer a pairwise-
preference (RLHF) pipeline runs before and alongside the rating fits
in operators/btrank.py: the head-to-head win-rate matrix with
confidence bounds (the leaderboard table), and the length-bias audit
(does the longer completion win more often — the classic verbosity
bias check).

Cross-engine exactness: counts and win rates are exact BIGINT/ppm as
usual (ROUND_NOTES playbook #10). The confidence bound needs a
square root; IEEE-754 requires +, −, ×, ÷ and sqrt to be CORRECTLY
ROUNDED, so a bound built from integer inputs through an identical
sequence of those five ops is bit-identical in Spark and DuckDB — no
transcendental enters. We use the Agresti-Coull 95% interval at
z = 2 exactly (z² = 4, integer), which keeps every intermediate a
rational of the counts:

    p~   = (w + 2) / (n + 4)
    half = 2·sqrt(p~·(1 − p~) / (n + 4))
    lo   = p~ − half,  hi = p~ + half

The ppm quantization floor(x·1e6 + 0.5) is applied to the identical
double on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000

# identical double expression on both engines: every op is IEEE
# correctly-rounded, inputs are exact integers, so the doubles (and
# the ppm flooring of them) match bit-for-bit. CRITICAL: literals use
# EXPONENT notation (2.0e0) — in Spark SQL a bare `2.0` is a DECIMAL
# literal, and decimal division truncates at its result scale (a
# ~1e-7-scale error that surfaced as 2-3 ppm drift vs DuckDB, which
# reads `2.0` as double); `2.0e0` is a DOUBLE literal in both.
_PTILDE = "((w_lo + 2.0e0) / (n + 4.0e0))"
_HALF = f"(2.0e0 * SQRT({_PTILDE} * (1.0e0 - {_PTILDE}) / (n + 4.0e0)))"


def _ppm(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 1.0e6 + 0.5e0) AS BIGINT)"


def win_rate_matrix(
    comparisons: DataFrame,
    winner: str = "winner",
    loser: str = "loser",
    min_games: int = 1,
) -> DataFrame:
    """Head-to-head table: one row per unordered player pair
    (lo < hi) with ``n`` games, ``w_lo`` wins by the smaller id,
    the exact win rate in ppm, and the Agresti-Coull 95% bounds
    (z = 2) on lo's true win probability, clamped to [0, 1e6] ppm.
    Self-games and NULL participants are dropped; pairs with fewer
    than ``min_games`` games are filtered (a 1-game "rate" is noise
    in any leaderboard).

    Scale shape: one hash aggregation over distinct pairs, then
    scalar arithmetic — no join, no window, work ∝ comparisons.
    """
    c = comparisons.filter(
        F.col(winner).isNotNull()
        & F.col(loser).isNotNull()
        & (F.col(winner) != F.col(loser))
    )
    pairs = (
        c.select(
            F.least(F.col(winner), F.col(loser)).alias("lo"),
            F.greatest(F.col(winner), F.col(loser)).alias("hi"),
            F.when(F.col(winner) < F.col(loser), F.lit(1))
            .otherwise(F.lit(0))
            .alias("lo_won"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("lo_won").cast("long").alias("w_lo"),
        )
        .filter(F.col("n") >= min_games)
    )
    return pairs.select(
        "lo",
        "hi",
        "n",
        "w_lo",
        F.expr(f"w_lo * {PPM}L div n").alias("win_rate_lo_ppm"),
        F.greatest(
            F.lit(0).cast("long"),
            F.expr(_ppm(f"{_PTILDE} - {_HALF}")),
        ).alias("ci_lo_ppm"),
        F.least(
            F.lit(PPM).cast("long"),
            F.expr(_ppm(f"{_PTILDE} + {_HALF}")),
        ).alias("ci_hi_ppm"),
    )


def win_rate_matrix_sql(
    comparisons_sql: str, min_games: int = 1
) -> str:
    """DuckDB twin — identical count algebra and the identical
    IEEE-exact double sequence for the bounds. ``comparisons_sql``
    must produce columns (winner, loser)."""
    return f"""
    WITH c AS (
      SELECT winner, loser FROM ({comparisons_sql})
      WHERE winner IS NOT NULL AND loser IS NOT NULL
        AND winner <> loser),
    pairs AS (
      SELECT LEAST(winner, loser) AS lo,
             GREATEST(winner, loser) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                  AS BIGINT) AS w_lo
      FROM c GROUP BY 1, 2)
    SELECT lo, hi, n, w_lo,
           CAST(w_lo * {PPM} // n AS BIGINT) AS win_rate_lo_ppm,
           GREATEST(CAST(0 AS BIGINT),
                    {_ppm(f"{_PTILDE} - {_HALF}")}) AS ci_lo_ppm,
           LEAST(CAST({PPM} AS BIGINT),
                 {_ppm(f"{_PTILDE} + {_HALF}")}) AS ci_hi_ppm
    FROM pairs WHERE n >= {min_games}
    ORDER BY lo, hi"""


def length_bias(
    comparisons: DataFrame,
    winner_len: str = "winner_len",
    loser_len: str = "loser_len",
    bucket_width: int = 200,
    max_bucket: int = 5,
) -> DataFrame:
    """Verbosity-bias audit over a preference log carrying the two
    sides' lengths: among comparisons whose sides differ in length,
    how often does the LONGER side win, overall and by
    length-difference bucket? A strong slope is the classic
    longer-response bias that leaks into reward models.

    Buckets: d = |winner_len − loser_len|, bucket =
    min(d div bucket_width, max_bucket) — the top bucket absorbs the
    tail. Equal-length comparisons are excluded (no longer side).
    → (bucket, n, n_longer_won, longer_win_ppm), exact integers.

    Scale shape: one projection + one hash aggregation over ≤
    max_bucket+1 groups; no join, no window.
    """
    d = F.col(winner_len) - F.col(loser_len)
    rows = comparisons.filter(
        F.col(winner_len).isNotNull()
        & F.col(loser_len).isNotNull()
        & (d != 0)
    ).select(
        F.least(
            F.expr(
                f"abs({winner_len} - {loser_len}) div {bucket_width}"
            ),
            F.lit(max_bucket).cast("long"),
        ).alias("bucket"),
        F.when(d > 0, F.lit(1)).otherwise(F.lit(0)).alias("longer_won"),
    )
    return (
        rows.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("longer_won").cast("long").alias("n_longer_won"),
        )
        .select(
            "bucket",
            "n",
            "n_longer_won",
            F.expr(f"n_longer_won * {PPM}L div n").alias(
                "longer_win_ppm"
            ),
        )
    )


def length_bias_sql(
    comparisons_sql: str, bucket_width: int = 200, max_bucket: int = 5
) -> str:
    """DuckDB twin. ``comparisons_sql`` must produce columns
    (winner_len, loser_len)."""
    return f"""
    WITH rows_ AS (
      SELECT LEAST(ABS(winner_len - loser_len) // {bucket_width},
                   {max_bucket}) AS bucket,
             CASE WHEN winner_len > loser_len THEN 1 ELSE 0 END
               AS longer_won
      FROM ({comparisons_sql})
      WHERE winner_len IS NOT NULL AND loser_len IS NOT NULL
        AND winner_len <> loser_len)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(longer_won) AS BIGINT) AS n_longer_won,
           CAST(SUM(longer_won) * {PPM} // COUNT(*) AS BIGINT)
             AS longer_win_ppm
    FROM rows_ GROUP BY bucket
    ORDER BY bucket"""


# exact BIGINT moment bound for spearman_rho: doubled average ranks
# reach 2n, so sum(r2x*r2y) <= n*(2n)^2 = 4n^3 must stay < 2^63
SPEARMAN_N_LIMIT = 1_290_000


def spearman_rho(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int = 32,
    n_limit: int = SPEARMAN_N_LIMIT,
) -> DataFrame:
    """Spearman rank correlation between two columns — the ranker-
    agreement metric an eval pipeline runs to compare two rating
    systems (e.g. Bradley-Terry θ vs Elo) or a reward model against
    human preference ranks. → one row (n BIGINT, rho_ppm BIGINT;
    NULL rho when either column is constant). NULL rows in either
    column are dropped.

    Ties use average ranks (Pearson over average ranks IS the
    tie-corrected Spearman). Exactness: average ranks are stored
    DOUBLED — r2(v) = 2·#smaller + #equal + 1, an exact integer —
    and the ranks come from one hash aggregation per column plus
    :func:`det_module_spark.operators.ids.global_cumsum` over the
    DISTINCT-value frame (the two-phase prefix sum; no global
    window, no per-row Python). Moments Σr2x, Σr2x², Σr2x·r2y are
    exact BIGINTs (order-independent), valid while 4n³ < 2^63, i.e.
    n ≤ ``SPEARMAN_N_LIMIT`` ≈ 1.29e6 ranked rows — ENFORCED by a
    raise_error guard (past it the sums would wrap silently in
    non-ANSI Spark while DuckDB errors; shard or pre-bucket beyond).
    The final Pearson combination runs in doubles from those exact
    integers through correctly-rounded ×,−,÷,sqrt only — identical
    expression, bit-identical across engines (module header).

    Scale shape: 2 hash aggregations (distinct values), 2 range
    prefix-sums over the distinct-value frames, 2 equi-joins back,
    one 1-row moment aggregate. Work ∝ rows + distinct values.
    """
    from det_module_spark.operators.ids import global_cumsum

    rows = df.filter(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    ).select(F.col(x).alias("__x"), F.col(y).alias("__y"))

    def r2(col: str, out: str) -> DataFrame:
        counts = rows.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        pref = global_cumsum(
            counts,
            ["v"],
            "c",
            out="smaller",
            num_partitions=num_partitions,
            inclusive=False,
        )
        return pref.select(
            F.col("v").alias(col),
            (2 * F.col("smaller") + F.col("c") + 1)
            .cast("long")
            .alias(out),
        )

    ranked = rows.join(r2("__x", "r2x"), "__x").join(
        r2("__y", "r2y"), "__y"
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2x").cast("long").alias("sx"),
        F.sum("r2y").cast("long").alias("sy"),
        F.sum(F.expr("r2x * r2x")).cast("long").alias("sxx"),
        F.sum(F.expr("r2y * r2y")).cast("long").alias("syy"),
        F.sum(F.expr("r2x * r2y")).cast("long").alias("sxy"),
    ).select(
        F.when(
            F.col("n") > n_limit,
            F.raise_error(
                F.concat(
                    F.lit("spearman_rho: n = "),
                    F.col("n").cast("string"),
                    F.lit(
                        f" > {n_limit}; the BIGINT rank "
                        "moments would overflow — shard the input "
                        "or pre-bucket the values"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("n"))
        .alias("n"),
        "sx", "sy", "sxx", "syy", "sxy",
    )
    # doubles from exact integers, identical expression both engines
    num = "(n * 1.0e0 * sxy - sx * 1.0e0 * sy)"
    dx = "(n * 1.0e0 * sxx - sx * 1.0e0 * sx)"
    dy = "(n * 1.0e0 * syy - sy * 1.0e0 * sy)"
    return m.select(
        "n",
        F.when(
            (F.expr(dx) > 0) & (F.expr(dy) > 0),
            F.expr(
                "CAST(FLOOR(" + num + f" / (SQRT({dx}) * SQRT({dy}))"
                " * 1.0e6 + 0.5e0) AS BIGINT)"
            ),
        )
        .cast("long")
        .alias("rho_ppm"),
    )


def spearman_rho_sql(pairs_sql: str) -> str:
    """DuckDB twin — identical rank construction (cumulative count
    over distinct values) and the identical double combination.
    ``pairs_sql`` must produce columns (x, y)."""
    num = "(n * 1.0e0 * sxy - sx * 1.0e0 * sy)"
    dx = "(n * 1.0e0 * sxx - sx * 1.0e0 * sx)"
    dy = "(n * 1.0e0 * syy - sy * 1.0e0 * sy)"
    return f"""
    WITH rows_ AS (
      SELECT x AS xv, y AS yv FROM ({pairs_sql})
      WHERE x IS NOT NULL AND y IS NOT NULL),
    cx AS (SELECT xv AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM rows_ GROUP BY 1),
    rx AS (SELECT v,
                  CAST(2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1
                       AS BIGINT) AS r2x
           FROM cx),
    cy AS (SELECT yv AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM rows_ GROUP BY 1),
    ry AS (SELECT v,
                  CAST(2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1
                       AS BIGINT) AS r2y
           FROM cy),
    ranked AS (
      SELECT rx.r2x, ry.r2y
      FROM rows_ JOIN rx ON rx.v = rows_.xv
      JOIN ry ON ry.v = rows_.yv),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2x) AS BIGINT) AS sx,
             CAST(SUM(r2y) AS BIGINT) AS sy,
             CAST(SUM(r2x * r2x) AS BIGINT) AS sxx,
             CAST(SUM(r2y * r2y) AS BIGINT) AS syy,
             CAST(SUM(r2x * r2y) AS BIGINT) AS sxy
      FROM ranked)
    SELECT n,
           CAST(CASE WHEN {dx} > 0 AND {dy} > 0
                THEN FLOOR({num} / (SQRT({dx}) * SQRT({dy}))
                           * 1.0e6 + 0.5e0)
                ELSE NULL END AS BIGINT) AS rho_ppm
    FROM m"""


KENDALL_MAX_ROWS = 5_000  # n(n-1)/2 pairs: 5k rows = 12.5M pairs


def kendall_tau(
    df: DataFrame,
    x: str,
    y: str,
    max_rows: int = KENDALL_MAX_ROWS,
) -> DataFrame:
    """Kendall tau-b between two columns over a BOUNDED frame — the
    pair-concordance rank correlation (more robust than Spearman to
    a few wild ranks; the other standard ranker-agreement number).
    → one row (n, concordant, discordant, tie_x, tie_y, tau_b_ppm;
    NULL tau when either column is constant). NULL rows dropped.
    EMPTY output (zero rows, not a NULL row) when fewer than 2
    non-NULL rows survive — no pair exists, so the groupBy('n') over
    the empty pair frame yields nothing; the SQL twin matches.
    Callers doing ``collect()[0]`` must handle the n < 2 case.

        tau_b = (C − D) / sqrt((C + D + Tx)·(C + D + Ty))

    with Tx/Ty the single-sided tie pair counts (both-tied pairs are
    excluded from both radicands, per the standard estimator).

    INHERENTLY QUADRATIC: every unordered row pair is examined, so
    this is a leaderboard-frame operator (model rankings, supplier
    tables, eval slices), NOT a corpus operator — ``max_rows``
    (default 5000 → 12.5M pairs) is enforced by a raise_error guard
    attached to every row BEFORE pairing, so an over-limit input
    fails on its first row instead of shuffling n² pairs. For
    corpus-scale rank agreement use :func:`spearman_rho` (linear +
    two prefix sums).

    Pairing uses monotonically_increasing_id solely for uniqueness
    (id_a < id_b enumerates each unordered pair once); the counts —
    and therefore the output — are independent of the id assignment.
    The final ratio runs in doubles from exact BIGINT counts through
    IEEE correctly-rounded ops (module header); ties in the pair
    counts make C, D, Tx, Ty exact integers in any engine.
    """
    rows = (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .select(F.col(x).alias("xv"), F.col(y).alias("yv"))
        .localCheckpoint(eager=True)  # pin ids + count once
    )
    n_df = rows.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # the guard is folded into n itself (which flows to the output),
    # so column pruning can never eliminate the raise_error; it fires
    # per-row BEFORE pairing, killing an over-limit run at row one
    guarded = rows.crossJoin(F.broadcast(n_df)).select(
        "xv",
        "yv",
        F.when(
            F.col("n") > max_rows,
            F.raise_error(
                F.concat(
                    F.lit("kendall_tau: n = "),
                    F.col("n").cast("string"),
                    F.lit(
                        f" > {max_rows} rows; the all-pairs shape is "
                        "quadratic — slice the frame or use "
                        "spearman_rho"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("n"))
        .alias("n"),
    )
    ids = guarded.select(
        "xv", "yv", "n", F.monotonically_increasing_id().alias("__id")
    )
    a = ids.select(
        F.col("xv").alias("xa"), F.col("yv").alias("ya"),
        F.col("__id").alias("ia"), "n",
    )
    b = ids.select(
        F.col("xv").alias("xb"), F.col("yv").alias("yb"),
        F.col("__id").alias("ib"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        "n",
        F.signum((F.col("xa") - F.col("xb")).cast("double")).alias("sx"),
        F.signum((F.col("ya") - F.col("yb")).cast("double")).alias("sy"),
    )
    m = pairs.groupBy("n").agg(
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0))
        .cast("long").alias("concordant"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0))
        .cast("long").alias("discordant"),
        F.sum(
            F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1).otherwise(0)
        ).cast("long").alias("tie_x"),
        F.sum(
            F.when((F.col("sy") == 0) & (F.col("sx") != 0), 1).otherwise(0)
        ).cast("long").alias("tie_y"),
    )
    dx = "((concordant + discordant + tie_x) * 1.0e0)"
    dy = "((concordant + discordant + tie_y) * 1.0e0)"
    return m.select(
        "n",
        "concordant",
        "discordant",
        "tie_x",
        "tie_y",
        F.when(
            (F.expr(dx) > 0) & (F.expr(dy) > 0),
            F.expr(
                "CAST(FLOOR((concordant - discordant) * 1.0e0"
                f" / (SQRT({dx}) * SQRT({dy})) * 1.0e6 + 0.5e0)"
                " AS BIGINT)"
            ),
        )
        .cast("long")
        .alias("tau_b_ppm"),
    )


def kendall_tau_sql(pairs_sql: str) -> str:
    """DuckDB twin — identical pair algebra (ROW_NUMBER ids; the
    counts are id-assignment independent) and the identical IEEE
    double combination. ``pairs_sql`` must produce columns (x, y)."""
    dx = "((concordant + discordant + tie_x) * 1.0e0)"
    dy = "((concordant + discordant + tie_y) * 1.0e0)"
    return f"""
    WITH rows_ AS (
      SELECT x AS xv, y AS yv,
             ROW_NUMBER() OVER () AS id
      FROM ({pairs_sql})
      WHERE x IS NOT NULL AND y IS NOT NULL),
    n_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_),
    pairs AS (
      SELECT n_t.n,
             SIGN(a.xv - b.xv) AS sx, SIGN(a.yv - b.yv) AS sy
      FROM rows_ a JOIN rows_ b ON a.id < b.id CROSS JOIN n_t),
    m AS (
      SELECT n,
             CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tie_x,
             CAST(SUM(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tie_y
      FROM pairs GROUP BY n)
    SELECT n, concordant, discordant, tie_x, tie_y,
           CAST(CASE WHEN {dx} > 0 AND {dy} > 0
                THEN FLOOR((concordant - discordant) * 1.0e0
                           / (SQRT({dx}) * SQRT({dy})) * 1.0e6 + 0.5e0)
                ELSE NULL END AS BIGINT) AS tau_b_ppm
    FROM m"""


CYCLES_MAX_PLAYERS = 2_000


def preference_cycles(
    comparisons: DataFrame,
    winner: str = "winner",
    loser: str = "loser",
    max_players: int = CYCLES_MAX_PLAYERS,
) -> DataFrame:
    """Transitivity audit of a preference log — Kendall's circular
    triads: among player triples whose three head-to-head records
    are all DECISIVE (strict majority winner), how many are cyclic
    (A beats B beats C beats A)? A high cyclic share means the
    pairwise data contradicts ANY total ordering, and a
    Bradley-Terry/Elo scalar fit will paper over real inconsistency
    (rubric drift, mixed populations). → one row, exact BIGINT:
    (n_players, n_decisive_edges, n_triads, n_cyclic, cyclic_ppm;
    NULL ppm when no complete triads exist).

    Leaderboard-frame operator: triad enumeration is a 3-way
    self-join of the decisive-edge set (players are a model/supplier
    dimension, never a corpus) — guarded loudly at ``max_players``
    via raise_error folded into the pairs-level n_players aggregate,
    eagerly checkpointed so it fires before any triad join (and on
    all-ties inputs too, where the decisive set is empty). Each
    directed 3-cycle is counted once (anchored at its smallest
    vertex); each complete triple once (x < y < z on the undirected
    edge set). Everything is counts — deterministic in any engine.
    """
    c = comparisons.filter(
        F.col(winner).isNotNull()
        & F.col(loser).isNotNull()
        & (F.col(winner) != F.col(loser))
    )
    pairs = (
        c.select(
            F.least(F.col(winner), F.col(loser)).alias("lo"),
            F.greatest(F.col(winner), F.col(loser)).alias("hi"),
            F.when(F.col(winner) < F.col(loser), F.lit(1))
            .otherwise(F.lit(0))
            .alias("lo_won"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("lo_won").cast("long").alias("w_lo"),
        )
        .localCheckpoint(eager=True)
    )
    # n_players comes from the PAIRS level (mirroring the SQL np CTE),
    # not from the decisive-edge frame: an all-ties log has zero
    # decisive edges but a real player count (ADVICE r9 medium). The
    # guard is folded into this 1-row aggregate — non-empty whenever
    # pairs is (agg-without-groupBy always yields one row) — and the
    # eager checkpoint fires it BEFORE any triad-join work runs.
    n_players_df = (
        pairs.select(F.col("lo").alias("p"))
        .unionByName(pairs.select(F.col("hi").alias("p")))
        .agg(F.count_distinct("p").cast("long").alias("np_raw"))
        .select(
            F.when(
                F.col("np_raw") > max_players,
                F.raise_error(
                    F.concat(
                        F.lit("preference_cycles: "),
                        F.col("np_raw").cast("string"),
                        F.lit(
                            f" players > {max_players}; triad "
                            "enumeration is a bounded-leaderboard "
                            "operation — slice the player set"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("np_raw"))
            .alias("n_players")
        )
        .localCheckpoint(eager=True)
    )
    # decisive directed edges (strict majority winner)
    dec = (
        pairs.filter(2 * F.col("w_lo") != F.col("n"))
        .select(
            F.when(2 * F.col("w_lo") > F.col("n"), F.col("lo"))
            .otherwise(F.col("hi"))
            .alias("src"),
            F.when(2 * F.col("w_lo") > F.col("n"), F.col("hi"))
            .otherwise(F.col("lo"))
            .alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    n_edges = dec.agg(F.count(F.lit(1)).cast("long").alias("n_decisive_edges"))
    # undirected decisive pairs for complete-triple counting
    und = dec.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    triads = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triads"))
    )
    # directed 3-cycles, each counted once at its smallest vertex
    d1 = dec.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    d2 = dec.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    d3 = dec.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    cyc = (
        d1.join(d2, "y")
        .join(d3, ["z", "x"])
        .filter((F.col("x") < F.col("y")) & (F.col("x") < F.col("z")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cyclic"))
    )
    return (
        F.broadcast(n_players_df)
        .crossJoin(n_edges)
        .crossJoin(triads)
        .crossJoin(cyc)
        .select(
            "n_players",
            "n_decisive_edges",
            "n_triads",
            "n_cyclic",
            F.when(
                F.col("n_triads") > 0,
                F.expr(f"n_cyclic * {PPM}L div n_triads"),
            )
            .cast("long")
            .alias("cyclic_ppm"),
        )
    )


def preference_cycles_sql(comparisons_sql: str) -> str:
    """DuckDB twin — identical edge derivation and triad joins.
    ``comparisons_sql`` must produce columns (winner, loser)."""
    return f"""
    WITH c AS MATERIALIZED (
      SELECT winner, loser FROM ({comparisons_sql})
      WHERE winner IS NOT NULL AND loser IS NOT NULL
        AND winner <> loser),
    pairs AS MATERIALIZED (
      SELECT LEAST(winner, loser) AS lo, GREATEST(winner, loser) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                  AS BIGINT) AS w_lo
      FROM c GROUP BY 1, 2),
    np AS (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) AS n_players
           FROM (SELECT lo AS p FROM pairs
                 UNION ALL SELECT hi FROM pairs)),
    dec AS MATERIALIZED (
      SELECT CASE WHEN 2 * w_lo > n THEN lo ELSE hi END AS src,
             CASE WHEN 2 * w_lo > n THEN hi ELSE lo END AS dst
      FROM pairs WHERE 2 * w_lo <> n),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_decisive_edges
           FROM dec),
    und AS MATERIALIZED (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM dec),
    triads AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triads
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    cyc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cyclic
      FROM dec d1
      JOIN dec d2 ON d2.src = d1.dst
      JOIN dec d3 ON d3.src = d2.dst AND d3.dst = d1.src
      WHERE d1.src < d1.dst AND d1.src < d2.dst)
    SELECT np.n_players, ne.n_decisive_edges, triads.n_triads,
           cyc.n_cyclic,
           CAST(CASE WHEN triads.n_triads > 0
                THEN cyc.n_cyclic * {PPM} // triads.n_triads
                ELSE NULL END AS BIGINT) AS cyclic_ppm
    FROM np CROSS JOIN ne CROSS JOIN triads CROSS JOIN cyc"""
