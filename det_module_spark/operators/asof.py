"""As-of (point-in-time) join — an operator Spark lacks natively.

For each probe row, attach the most recent build-side row with
``build.ts <= probe.ts`` per key (the trades/quotes pattern; here:
"latest view before each click"). Implemented as a composition of
existing DataFrame ops — no custom physical operator needed:

1. pre-aggregate the build side to one row per (key, ts) so the match
   is deterministic under duplicate timestamps;
2. tag and union both sides (build sorts before probe on ties, making
   the match inclusive: build.ts == probe.ts matches);
3. one window pass per key ordered by (ts, side):
   ``last(value, ignoreNulls)`` carries the latest build value forward;
4. keep probe rows.

Cost: one shuffle on the key (the union sorts within partitions) —
same asymptotics as a sort-merge join, and the window state is one
value per key. At 100 TB both sides shuffle once on the key;
skew on hot keys is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every probe row survives; unmatched probes get
    null ``prefix*`` columns.

    ``direction="backward"`` (default) matches the latest build row
    at-or-before the probe (DuckDB ``ASOF LEFT JOIN … probe.ts >=
    build.ts``); ``"forward"`` matches the earliest at-or-after
    (``probe.ts <= build.ts``). ``tolerance_seconds`` nulls the match
    when the time gap exceeds it — since the as-of match is the
    NEAREST candidate, a nearest match outside tolerance implies no
    candidate inside, so post-filtering is exact (pandas
    ``merge_asof`` semantics).

    Plan shape is unchanged: union + one carry window partitioned by
    key — one shuffle, no range join, no per-row probe.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # a build row with a NULL timestamp can never be "the nearest
    # at-or-before/after" — and left in, it SORTS FIRST (window
    # NULLS-FIRST asc), so its VALUE would be carried into probes
    # while asof_ts comes from a different (real) build row: an
    # inconsistent match whose tolerance gap is computed against the
    # wrong timestamp. Exclude it at entry.
    build = build.filter(F.col(ts).isNotNull())
    # deterministic build side: one row per (key, ts) — last writer
    # wins by max(value) so duplicate-timestamp behavior is defined
    build_agg = build.groupBy(key, ts).agg(
        *[F.max(c).alias(c) for c in value_cols]
    )

    b = build_agg.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        *[F.lit(None).cast(t.dataType).alias(f"_p_{c}")
          for c, t in zip(probe.columns, probe.schema.fields)],
    )
    p = probe.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(build_agg.schema[c].dataType).alias(f"{prefix}{c}")
          for c in value_cols],
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    unioned = b.unionByName(p)

    if direction == "backward":
        # build(_side=0) sorts before probe(_side=1) at equal ts, so
        # an equal-timestamp build is visible in the preceding frame
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda col: F.last(col, ignorenulls=True).over(w)  # noqa: E731
    else:
        # forward: probe first at equal ts, builds visible in the
        # following frame (including equal-ts ones)
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts), F.desc("_side"))
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda col: F.first(col, ignorenulls=True).over(w)  # noqa: E731

    # Carry ts + ALL value columns as ONE struct so the match is
    # atomic: a build row whose value column is NULL must still be THE
    # match (and carry its NULL), never skipped in favor of an older
    # row's value while asof_ts reports the nearer row. The struct is
    # non-NULL for every build row (its ts is non-NULL after the entry
    # filter), so first/last(ignorenulls) lands on whole build rows.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(ts).alias("__asof_ts__"),
            *[F.col(f"{prefix}{c}").alias(c) for c in value_cols],
        ),
    )
    carried = unioned.select("*", pick(payload).alias("_match"))
    carried = carried.filter(F.col("_side") == 1)
    # a probe row with a NULL timestamp has no defined before/after:
    # it sorts NULLS-FIRST, so in the FORWARD direction its
    # [0, unboundedFollowing) frame contains every build row and it
    # would spuriously match the earliest one. DuckDB ASOF / pandas
    # merge_asof leave it unmatched — null the match out explicitly.
    carried = carried.withColumn(
        "_match", F.when(F.col(ts).isNotNull(), F.col("_match"))
    )
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        # cast through TIMESTAMP so NTZ inputs work; any session-tz
        # shift applies to both operands and cancels in the difference
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        mts = F.col("_match.__asof_ts__")
        gap = (
            us(F.col(ts)) - us(mts)
            if direction == "backward"
            else us(mts) - us(F.col(ts))
        )
        ok = mts.isNotNull() & (gap <= F.lit(tol_us))
        carried = carried.withColumn("_match", F.when(ok, F.col("_match")))
    out_cols = [F.col(f"_p_{c}").alias(c) for c in probe.columns]
    out_cols += [F.col("_match.__asof_ts__").alias(f"{prefix}ts")]
    out_cols += [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols
    ]
    return carried.select(*out_cols)
