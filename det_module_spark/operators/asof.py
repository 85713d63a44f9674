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
) -> DataFrame:
    """Left as-of join: every probe row survives; unmatched probes get
    null ``prefix*`` columns. Matches DuckDB's
    ``ASOF LEFT JOIN ... ON probe.key = build.key AND probe.ts >= build.ts``.
    """
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

    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True)
            .over(w)
            .alias(f"_carried_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias(f"{prefix}ts"),
    )
    out_cols = [F.col(f"_p_{c}").alias(c) for c in probe.columns]
    out_cols += [F.col(f"{prefix}ts")]
    out_cols += [F.col(f"_carried_{c}").alias(f"{prefix}{c}") for c in value_cols]
    return carried.filter(F.col("_side") == 1).select(*out_cols)
