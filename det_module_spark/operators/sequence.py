"""Event-sequence operators: Markov transition matrices and
id-sequence gap detection.

Product-analytics staples over the ``events`` stream shape. Both are
single-window dataflows: partition by the sequence key, order by
(time, unique id) — the unique tiebreak makes every window
deterministic across engines and partitionings (ROUND_NOTES.md #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _transition_counts(
    events: DataFrame, key: str, state: str, ts: str, tiebreak: str
) -> DataFrame:
    """Shared pair extraction for the two transition-matrix variants:
    (from_state, to_state, n) via one lead window over the per-key
    sequence + one hash aggregation. Kept in ONE place so the pair
    semantics (ordering tiebreak, final-event drop) cannot diverge
    between the float and ppm outputs."""
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(tiebreak))
    return (
        events.select(
            F.col(state).alias("from_state"),
            F.lead(state).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
    prob_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: → (from_state, to_state, n, p) where p = n / Σn over
    the from_state row, rounded once (exact-int inputs).

    Shape: one window (lead over the per-key sequence) + one hash
    aggregation keyed by the state pair — the matrix is |states|²
    regardless of event volume; the shuffle is the window's hash
    exchange on ``key``."""
    pairs = _transition_counts(events, key, state, ts, tiebreak)
    tot = Window.partitionBy("from_state")
    scale = F.lit(float(10**prob_digits))
    p = F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        (F.floor(p * scale + F.lit(0.5)) / scale).alias("p"),
    )


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    group: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Find holes in an integer id sequence: → (group?, gap_start,
    gap_end, gap_len) for every maximal run of missing ids between
    observed neighbors. The audit for "did ingestion drop rows?"
    when upstream assigns monotone ids.

    Gap columns are always BIGINT (ids are cast to long in both
    paths — one output contract regardless of the input id width).

    Grouped: one per-``group`` lag window (hash-partitioned, scale-
    safe). Ungrouped: a global lag window would collapse onto one
    partition, so instead the distinct ids are range-partitioned and
    sorted within partitions, each partition scans its own sorted run
    for gaps (exact int64 numpy arithmetic — pandas diff/shift would
    round ids above 2^53 through float64), and the ≤ #partitions−1
    boundary gaps are closed from the per-partition (min, max) —
    control-plane scalars — on the driver. The range layout is pinned
    (localCheckpoint) so the boundary job and the gap job see
    identical partitions; output is partition-independent because it
    depends only on the id set.
    """
    if group:
        ids = df.select(
            group, F.col(id_col).cast("long").alias("id")
        ).distinct()
        w = Window.partitionBy(group).orderBy(F.asc("id"))
        with_prev = ids.withColumn("prev", F.lag("id").over(w))
        return with_prev.filter(
            F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1)
        ).select(
            group,
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
            (F.col("id") - F.col("prev") - 1).alias("gap_len"),
        )

    ids = (
        df.select(F.col(id_col).cast("long").alias("id"))
        .distinct()
        .repartitionByRange(num_partitions, F.col("id"))
        .sortWithinPartitions("id")
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    bounds = (
        ids.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )

    from pyspark.sql import types as T

    gap_schema = T.StructType(
        [
            T.StructField("gap_start", T.LongType(), False),
            T.StructField("gap_end", T.LongType(), False),
            T.StructField("gap_len", T.LongType(), False),
        ]
    )

    def local_gaps(iterator):
        import numpy as np
        import pandas as pd

        prev_tail = None
        for pdf in iterator:  # sorted within the partition
            a = pdf["id"].to_numpy(dtype="int64", copy=False)
            if prev_tail is not None:
                a = np.concatenate(([prev_tail], a))
            if len(a) >= 2:
                # exact int64: never route ids through float64
                d = a[1:] - a[:-1]
                hit = d > 1
                if hit.any():
                    yield pd.DataFrame(
                        {
                            "gap_start": a[:-1][hit] + 1,
                            "gap_end": a[1:][hit] - 1,
                            "gap_len": d[hit] - 1,
                        }
                    )
            if len(a):
                prev_tail = int(a[-1])

    inner = ids.mapInPandas(local_gaps, schema=gap_schema)
    # boundary gaps between consecutive non-empty partitions
    edges = sorted(
        ((r["pid"], r["lo"], r["hi"]) for r in bounds),
        key=lambda t: t[0],
    )
    boundary = []
    for (_, _, hi_prev), (_, lo_next, _) in zip(edges, edges[1:]):
        if lo_next - hi_prev > 1:
            boundary.append(
                (hi_prev + 1, lo_next - 1, lo_next - hi_prev - 1)
            )
    if boundary:
        inner = inner.unionByName(
            spark.createDataFrame(boundary, schema=gap_schema)
        )
    return inner


def transition_matrix_ppm(
    events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Integer first-order transition matrix: → (from_state, to_state,
    p_ppm) with p_ppm = n·10⁶ div Σn over the from_state row — the
    exact-integer sibling of ``event_transitions`` that
    ``markov_power`` can raise to the k-th power without float
    accumulation. One window + one agg; the matrix is |states|²."""
    pairs = _transition_counts(events, key, state, ts, tiebreak)
    tot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        F.expr("n * 1000000 div sum(n) over (partition by from_state)")
        .alias("p_ppm"),
    )


def markov_power(trans: DataFrame, k: int) -> DataFrame:
    """P^k for a ppm transition matrix by join-based exponentiation:
    squaring is the matrix self-join P²(a,b) = Σ_m P(a,m)·P(m,b),
    carried in integer ppm (terms multiply to ppm², the row sum stays
    inside int64 for any real state count, one ``div 10⁶`` per
    squaring; the ≤1-ppm truncation per squaring is documented and
    deterministic). k must be a power of two — each squaring is one
    equi-join on the shared mid-state plus one hash agg, so the whole
    power is log₂k shuffles over |states|²-sized frames, independent
    of event volume.

    "Where does a user end up after k steps?" — the k-step reach
    matrix behind churn-path and funnel-escape analyses.

    SUBSTOCHASTIC semantics, by construction: a state observed only
    as a destination (a terminal — e.g. the churn/exit event) has no
    outgoing row, so the mid-state join drops every path through it
    and a row's P^k mass can sum below 10⁶ by exactly the
    mass absorbed at terminals within k steps (plus the documented
    ≤1-ppm truncation per squaring). That is the standard
    hitting-probability reading ("still transitioning after k
    steps"); for ABSORBING semantics instead, union an identity row
    (t, t, 10⁶) for each terminal state into ``trans`` before
    powering.
    """
    if k < 1 or (k & (k - 1)) != 0:
        raise ValueError("k must be a power of two")
    out = trans
    steps = k.bit_length() - 1
    for _ in range(steps):
        a = out.alias("a")
        b = out.alias("b")
        out = (
            a.join(b, F.col("a.to_state") == F.col("b.from_state"))
            .groupBy(
                F.col("a.from_state").alias("from_state"),
                F.col("b.to_state").alias("to_state"),
            )
            .agg(
                F.expr("CAST(sum(a.p_ppm * b.p_ppm) div 1000000 AS BIGINT)")
                .alias("p_ppm")
            )
        )
    return out
