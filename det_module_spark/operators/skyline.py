"""Skyline (Pareto frontier) query: the rows not dominated in the
(minimize x, maximize y) plane.

The textbook SQL form — ``NOT EXISTS (SELECT ... WHERE x' <= x AND
y' >= y AND (x' < x OR y' > y))`` — is an O(n²) self-join; the
textbook single-node form is one pass over an x-sorted stream keeping
the running max of y. The distributed version keeps the one-pass idea
without a global window (the same two-job recipe as
``operators/ids.dense_ids``):

1. range-partition by x and sort within partitions — the standard
   total-order layout; equal x values land in ONE partition (the range
   partitioner assigns by key), so cross-partition state reduces to a
   single scalar per partition;
2. first job: per-partition max(y) — #partitions rows collected on the
   driver (control plane) and prefix-maxed, giving each partition the
   best y among ALL strictly-cheaper partitions;
3. second job: Arrow-batched pass per partition. A row survives iff
   its y beats the running max of y over strictly-smaller x (partition
   prefix ∪ earlier groups in the partition) AND it holds the max y of
   its own x-group (ties on both dims all survive — neither dominates).

Scale shape: one range exchange + one tiny collect + one map — no
self-join, no global single-task stage. Caveat shared with dense_ids:
a heavily skewed x (one value = half the corpus) concentrates that
value's rows in one range partition; the per-batch pass only ever
buffers one x-group, so memory tracks the largest tie group, not the
partition.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier minimizing ``x`` while
    maximizing ``y`` (negate a column to flip its direction). Rows
    with a NULL in either dimension are not comparable and are
    dropped. Duplicate (x, y) points on the frontier all survive."""
    clean = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    parted = clean.repartitionByRange(
        num_partitions, F.col(x)
    ).sortWithinPartitions(F.asc(x), F.desc(y))
    # pin the range boundaries: the max job and the scan job must see
    # IDENTICAL partitions (the range partitioner re-samples per
    # action otherwise) — same move as dense_ids
    parted = parted.localCheckpoint(eager=True)

    maxes = (
        parted.select(
            F.spark_partition_id().alias("pid"), F.col(y).alias("y")
        )
        .groupBy("pid")
        .agg(F.max("y").alias("m"))
        .collect()
    )
    part_max = {r["pid"]: r["m"] for r in maxes}
    prefix: dict[int, object] = {}
    best = None
    for pid in range(num_partitions):
        prefix[pid] = best
        m = part_max.get(pid)
        if m is not None and (best is None or m > best):
            best = m

    schema = parted.schema

    def scan(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run_max = prefix.get(pid)  # best y among strictly smaller x
        pending = None  # buffered rows of the (possibly open) x-group
        for pdf in iterator:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if len(pdf) == 0:
                pending = None
                continue
            last_x = pdf[x].iloc[-1]
            closed = pdf[pdf[x] != last_x]
            pending = pdf[pdf[x] == last_x]
            if len(closed):
                yield _emit_groups(closed, x, y, run_max)
                top = closed[y].max()
                if run_max is None or top > run_max:
                    run_max = top
        if pending is not None and len(pending):
            yield _emit_groups(pending, x, y, run_max)

    return parted.mapInPandas(scan, schema=schema)


def _emit_groups(pdf: pd.DataFrame, x: str, y: str, run_max) -> pd.DataFrame:
    """Filter a frame of COMPLETE x-groups (sorted x asc) to its
    skyline rows given the running max of y over strictly-smaller x.

    The prev-group running max stays in the column's OWN dtype:
    ``cummax().shift(1)`` would route int64 y through float64 (shift
    inserts NaN), and above 2^53 a true frontier row with
    y = prev_max + 1 rounds onto prev_max and the strict ``>`` drops
    it — the same hazard sequence_gaps documents for pandas
    diff/shift. A boolean has-predecessor mask replaces the NaN
    sentinel instead."""
    import numpy as np

    gmax = pdf.groupby(x, sort=False)[y].transform("max")
    # running max over groups strictly before each row's group,
    # dtype-preserving (no shift/NaN)
    per_group = pdf.groupby(x, sort=True)[y].max()
    vals = per_group.to_numpy()
    acc = np.maximum.accumulate(vals)
    prev_vals = np.empty_like(vals)
    prev_vals[1:] = acc[:-1]
    has_prev = np.ones(len(vals), dtype=bool)
    if run_max is not None:
        prev_vals[0] = run_max
        prev_vals = np.maximum(prev_vals, run_max)
    else:
        prev_vals[0] = vals[0]  # placeholder, masked by has_prev
        has_prev[0] = False
    m1 = pdf[x].map(pd.Series(prev_vals, index=per_group.index))
    h1 = pdf[x].map(pd.Series(has_prev, index=per_group.index))
    beats_cheaper = ~h1 | (pdf[y] > m1)
    holds_group = pdf[y] == gmax
    return pdf[beats_cheaper & holds_group]
