"""Ordered-sequence analytics over event logs.

Four classic engine capabilities the reference's roadmap groups under
"sequence/row-pattern queries" (SURVEY.md §2.5 windows family), each
expressed as one-shuffle-per-key DataFrame plans:

- :func:`sequence_pattern_counts` — MATCH_RECOGNIZE-lite: per-key
  event-type strings matched against a regular expression.
- :func:`longest_streaks` — gaps-and-islands: consecutive-day runs.
- :func:`coalesce_intervals` — merge overlapping [start, end] spans.
- :func:`precedence_counts` — first-occurrence ordering statistics
  between event types across keys.

All four shuffle once on the entity key and run their windows inside
the key partition (never a global sort), so they hold at 100 TB: the
scale unit is the per-key event count, the usual MATCH_RECOGNIZE /
sessionization contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sequence_pattern_counts(
    events: DataFrame,
    key: str,
    order_cols: list[str],
    type_col: str,
    char_map: dict[str, str],
    pattern: str,
) -> DataFrame:
    """Row-pattern matching (MATCH_RECOGNIZE-lite): → (key, seq_len,
    n_matches) where n_matches counts non-overlapping, leftmost-greedy
    matches of ``pattern`` against the key's event-type string.

    Each event maps to ONE character via ``char_map`` (unmapped types
    become 'x' so they break — never bridge — a match), the per-key
    sequence is built with one collect_list + array_sort (sorted by
    ``order_cols``, which must be a deterministic total order — include
    a tiebreak id), and the regex runs once per key. ``pattern`` must
    stay in the Java∩RE2 common subset (no backreferences or
    lookaround) so Spark and the SQL oracle agree; greedy quantifier
    semantics match in that subset.

    Scale: one shuffle on ``key``; per-key state is the event string
    (the PARTITION BY contract every MATCH_RECOGNIZE engine has). No
    window, no join.
    """
    ch = F.lit("x")
    for k in sorted(char_map, reverse=True):
        ch = F.when(F.col(type_col) == k, F.lit(char_map[k])).otherwise(ch)
    ordered = events.select(
        F.col(key).alias("key"),
        F.struct(
            *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
            ch.alias("ch"),
        ).alias("s"),
    )
    seq = (
        ordered.groupBy("key")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            "key",
            F.array_join(
                F.transform(F.col("arr"), lambda s: s["ch"]), ""
            ).alias("seq"),
        )
    )
    return seq.select(
        "key",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit(pattern)).cast("long").alias("n_matches"),
    )


def longest_streaks(df: DataFrame, key: str, day: Column) -> DataFrame:
    """Gaps-and-islands over active days: → (key, n_active_days,
    n_streaks, longest_streak). A streak is a maximal run of
    consecutive calendar days with ≥1 row.

    The island id is the classic ``day − row_number`` anchor: distinct
    (key, day), one per-key window for row_number, then two hash aggs.
    Everything stays keyed by ``key`` — the window sorts only within a
    key's (distinct-day-sized) partition slice.
    """
    days = df.select(F.col(key).alias("key"), day.alias("day")).distinct()
    w = Window.partitionBy("key").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub("day", F.row_number().over(w))
    )
    streaks = anchored.groupBy("key", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("key").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


def coalesce_intervals(
    df: DataFrame, key: str, start: Column, end: Column
) -> DataFrame:
    """Merge overlapping-or-touching integer intervals per key:
    → (key, start_s, end_s, n_merged). Two spans merge iff
    next.start ≤ running_max(end) over all earlier spans (ordered by
    (start, end) within the key) — the standard interval-coalescing
    window recipe, robust to contained intervals because the running
    max, not the previous row's end, defines the island boundary.

    One shuffle on ``key``; both windows sort inside the key partition.
    """
    base = df.select(
        F.col(key).alias("key"), start.alias("s"), end.alias("e")
    )
    w = Window.partitionBy("key").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    islanded = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islanded.groupBy("key", "island").agg(
        F.min("s").alias("start_s"),
        F.max("e").alias("end_s"),
        F.count(F.lit(1)).alias("n_merged"),
    ).drop("island")


def precedence_counts(
    events: DataFrame, key: str, type_col: str, ts: Column
) -> DataFrame:
    """First-occurrence precedence statistics: → (type_a, type_b,
    n_keys) = for each ORDERED pair of distinct event types, how many
    keys saw their first ``type_a`` strictly before their first
    ``type_b`` (ties on the timestamp broken by type name, so the
    relation is a total order per key and the pair counts are exact
    and partitioning-independent).

    The non-adjacent companion to a transition matrix: "did signup
    ever precede purchase for this user", not "was it the immediately
    previous event". One agg to first-occurrence (≤ |types| rows per
    key), one per-key equi-join on that tiny table, one count agg —
    per-key cost |types|², never |events|².
    """
    firsts = events.groupBy(
        F.col(key).alias("key"), F.col(type_col).alias("t")
    ).agg(F.min(ts).alias("first_ts"))
    a, b = firsts.alias("a"), firsts.alias("b")
    before = (F.col("a.first_ts") < F.col("b.first_ts")) | (
        (F.col("a.first_ts") == F.col("b.first_ts"))
        & (F.col("a.t") < F.col("b.t"))
    )
    return (
        a.join(b, "key")
        .where((F.col("a.t") != F.col("b.t")) & before)
        .groupBy(
            F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
