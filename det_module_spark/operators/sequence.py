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
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(tiebreak))
    pairs = (
        events.select(
            F.col(state).alias("from_state"),
            F.lead(state).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
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
    df: DataFrame, id_col: str, group: str | None = None
) -> DataFrame:
    """Find holes in an integer id sequence: → (group?, gap_start,
    gap_end, gap_len) for every maximal run of missing ids between
    observed neighbors. Lag over the ordered distinct ids; a
    difference > 1 marks a gap. The audit for "did ingestion drop
    rows?" when upstream assigns monotone ids."""
    keys = [group] if group else []
    ids = df.select(*keys, F.col(id_col).alias("id")).distinct()
    w = Window.partitionBy(*keys).orderBy(F.asc("id"))
    with_prev = ids.withColumn("prev", F.lag("id").over(w))
    return (
        with_prev.filter(
            F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1)
        )
        .select(
            *keys,
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
            (F.col("id") - F.col("prev") - 1).alias("gap_len"),
        )
    )
