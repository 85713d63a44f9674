"""Change-data-capture apply and SCD Type-2 history — the
table-maintenance operators of a warehouse-grade pipeline.

The reference's cache manifest is morally a CDC target (find-then-
update-else-insert, extract_check.py:165-183); these operators give
that pattern a general, declarative form. Both are deterministic by
construction: last-writer-wins is decided by an explicit total order
(sequence column with unique values per key), never by arrival order.

Scale shape: one window (hash exchange + sort on the key) plus one
join for ``cdc_apply``; one union + one window for ``scd2_history``.
At 100 TB the change batch is typically ≪ the snapshot, so the join
broadcasts; the snapshot itself is never shuffled by ``cdc_apply``
when the join key equals the snapshot's bucketing key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Apply an I/U/D change batch to a snapshot: per key, the change
    with the highest ``seq`` wins; 'D' removes the row, 'I'/'U' upsert
    the change's ``value_cols``; untouched snapshot rows pass through.

    ``seq`` must be unique per key (a log offset / commit LSN) — that
    is what makes the result independent of partitioning and engine.
    """
    w = Window.partitionBy(key).orderBy(F.desc(seq))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    s = snapshot.alias("s")
    c = latest.alias("c")
    # null-safe key match, mirroring snapshot_diff: a plain equi-join
    # never matches NULL keys, so a NULL-key change would coexist with
    # (instead of replace/delete) the NULL-key snapshot row — breaking
    # the documented identity that snapshot_diff's output replays old
    # into new through cdc_apply (the property test's contract).
    joined = s.join(
        c, F.col(f"s.{key}").eqNullSafe(F.col(f"c.{key}")), "full_outer"
    )
    # drop deleted keys; otherwise change values win over snapshot
    out_cols = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"c.{key}")).alias(key)
    ] + [
        F.when(F.col(f"c.{op}").isNotNull(), F.col(f"c.{v}"))
        .otherwise(F.col(f"s.{v}"))
        .alias(v)
        for v in value_cols
    ]
    return joined.filter(
        F.col(f"c.{op}").isNull() | (F.col(f"c.{op}") != "D")
    ).select(*out_cols)


def log_as_of(
    log: DataFrame,
    key: str,
    seq: str,
    value_cols: list[str],
    as_of,
    op: str = "op",
) -> DataFrame:
    """Point-in-time reconstruction from an I/U/D change log — the
    read side of the CDC family (``cdc_apply`` folds a batch forward,
    ``snapshot_diff`` derives a batch, this replays the log to a cut):
    the table state AS OF ``as_of`` is, per key, the change with the
    highest ``seq`` ≤ ``as_of``, dropped when that change is a 'D'.

    ``seq`` must be unique per key (commit LSN / event time) — the
    same total-order contract as ``cdc_apply``.

    Scale shape: one pushed-down range filter (``seq <= as_of``
    reaches the scan — on a log partitioned by day the cut prunes
    partitions) + one per-key window. No joins.
    """
    w = Window.partitionBy(key).orderBy(F.desc(seq))
    latest = (
        log.filter(F.col(seq) <= F.lit(as_of))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return latest.filter(F.col(op) != "D").select(key, *value_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Generate a change feed by diffing two snapshots of a keyed
    table — the inverse of ``cdc_apply`` (which consumes one), and the
    batch equivalent of a lakehouse change-data-feed read.

    → (key, change_op, old_<c>..., new_<c>...): 'insert' for keys only
    in ``new``, 'delete' for keys only in ``old``, 'update' for keys in
    both whose ``compare_cols`` differ (null-safe comparison — a
    NULL→value transition IS an update). Unchanged keys are dropped, so
    the result is exactly the minimal change batch that replays
    ``old`` into ``new`` through ``cdc_apply``.

    Scale shape: one full-outer equi-join on the key — a single hash
    shuffle of each snapshot, and no shuffle at all of the (typically
    dominant) unchanged mass beyond it. When both snapshots are
    bucketed by the key the exchange disappears entirely; AQE picks a
    broadcast when either side is small.
    """
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .when(changed, F.lit("update"))
    )
    out = [
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        op.alias("change_op"),
    ]
    out += [F.col(f"o.{c}").alias(f"old_{c}") for c in compare_cols]
    out += [F.col(f"n.{c}").alias(f"new_{c}") for c in compare_cols]
    return joined.select(*out).filter(F.col("change_op").isNotNull())


def scd2_history(
    initial: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    seq: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2: version every attribute change.

    → (key, attr, valid_from, valid_to, is_current): the ``initial``
    row opens with valid_from = NULL (beginning of time); each update
    opens a new version at its ``ts`` and closes the previous one
    (valid_to = next version's valid_from). Ties on ``ts`` are broken
    by ``seq`` — pass one whenever ``ts`` is coarse (dates).

    One union + one window per key (ordered, NULLS FIRST so the
    initial row sorts before every update).
    """
    base = initial.select(
        F.col(key),
        F.col(attr),
        F.lit(None).cast(updates.schema[ts].dataType).alias("valid_from"),
        F.lit(None).cast("long").alias("__seq"),
    )
    upd = updates.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        (F.col(seq) if seq else F.lit(0)).cast("long").alias("__seq"),
    )
    versions = base.unionByName(upd)
    w = Window.partitionBy(key).orderBy(
        F.asc_nulls_first("valid_from"), F.asc_nulls_first("__seq")
    )
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.lead("valid_from", 1).over(w).isNull())
        .drop("__seq")
    )
