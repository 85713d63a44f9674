"""Marketing-style touch attribution over event streams.

Given a per-user event sequence mixing TOUCHES (channel exposures:
view / click / signup, …) and CONVERSIONS (purchases carrying value),
credit each conversion to the first and to the last touch that
preceded it — the two classic single-touch attribution models. The
same primitive powers training-data provenance questions ("which
ingest source first/last contributed the doc this label came from").

Shape: ONE window pass partitioned by user (never a global sort) with
ignore-nulls first/last over the strictly-preceding frame, then one
hash agg per (model, channel). Scale unit is the user key; 100 TB of
events shuffle once on user_id and once on the (tiny) channel key.

Semantics pinned for cross-engine parity:
- "preceding" = ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  under a caller-supplied deterministic total order (include a
  tiebreak column, e.g. event_id) — a same-instant touch counts iff
  it sorts before the conversion.
- conversions with no prior touch land in channel '(none)' so credit
  totals always reconcile with the conversion count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def touch_attribution(
    events: DataFrame,
    user: str,
    order_cols: list[str],
    channel: Column,
    is_touch: Column,
    is_conv: Column,
    value: Column,
) -> DataFrame:
    """Per-conversion credit assignment: → (user, first_touch,
    last_touch, value_c) — one row per conversion event, with the
    first/last preceding touch channel (or '(none)')."""
    w = (
        Window.partitionBy(user)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_ch = F.when(is_touch, channel)
    annotated = events.select(
        F.col(user).alias("user"),
        is_conv.alias("is_conv"),
        value.alias("value_c"),
        F.first(touch_ch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch_ch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return annotated.where(F.col("is_conv")).select(
        "user",
        F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        "value_c",
    )


def attribution_report(conversions: DataFrame) -> DataFrame:
    """Channel-level rollup of :func:`touch_attribution` output under
    BOTH single-touch models: → (model, channel, n_conv, value_c),
    model ∈ {'first_touch', 'last_touch'}. One unpivot + one agg; the
    two models share the single window pass upstream."""
    melted = conversions.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("first_touch").alias("channel"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("last_touch").alias("channel"),
                ),
            )
        ).alias("m"),
        "value_c",
    )
    return melted.groupBy(
        F.col("m.model").alias("model"), F.col("m.channel").alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_conv"),
        F.sum("value_c").alias("value_c"),
    )


def linear_attribution(
    events: DataFrame,
    user: str,
    order_cols: list[str],
    channel: Column,
    is_touch: Column,
    is_conv: Column,
    value: Column,
) -> DataFrame:
    """Multi-touch LINEAR attribution: every touch preceding a
    conversion shares its value equally: → (channel, n_touches,
    credit_c) with credit_c = Σ over conversions of
    (value_c · channel_touch_count) div n_touches — exact integer
    division per (conversion, channel), so totals reconcile with the
    conversion value up to one unit per channel (floor remainder;
    documented, deterministic).

    Shape: conversions get a per-user running touch INDEX (one window
    pass); each (conversion, preceding-touch) pair materializes via a
    per-user equi-join on the user key with an index inequality —
    fan-out = touches·convs within the user only. Use first/last
    (touch_attribution) when per-user event counts are unbounded.
    """
    w = Window.partitionBy("user").orderBy(*[F.col(c) for c in order_cols])
    base = events.select(
        F.col(user).alias("user"),
        *[F.col(c) for c in order_cols],
        channel.alias("ch"),
        is_touch.alias("it"),
        is_conv.alias("ic"),
        value.alias("value_c"),
    ).withColumn("seq", F.row_number().over(w))
    touches = base.where(F.col("it")).select(
        "user", F.col("seq").alias("tseq"), "ch"
    )
    convs = base.where(F.col("ic")).select(
        "user", F.col("seq").alias("cseq"), "value_c"
    )
    pairs = convs.join(touches, "user").where(F.col("tseq") < F.col("cseq"))
    per_conv = pairs.groupBy("user", "cseq", "value_c", "ch").agg(
        F.count(F.lit(1)).alias("n_ch")
    )
    tot = pairs.groupBy("user", "cseq").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    credited = per_conv.join(tot, ["user", "cseq"]).select(
        "ch",
        "n_ch",
        F.expr("(value_c * n_ch) div n_t").alias("credit"),
    )
    return credited.groupBy(F.col("ch").alias("channel")).agg(
        F.sum("n_ch").alias("n_touches"),
        F.sum("credit").alias("credit_c"),
    )
