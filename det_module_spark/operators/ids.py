"""Global dense-id assignment (surrogate keys) without a global window.

``ROW_NUMBER() OVER (ORDER BY key)`` is the classic surrogate-key
recipe and the classic scale trap: an empty-partition-spec window
collapses the whole table onto ONE task. The distributed equivalent is
two-phase range enumeration:

1. range-partition by the order key and sort within partitions — the
   standard total-order layout (same machinery as ``orderBy``, no
   single-task stage);
2. count rows per partition, prefix-sum the counts on the driver
   (#partitions scalars — control plane);
3. enumerate within each partition (Arrow-batched) and add the
   partition's offset.

The result depends only on the global key order, not on partition
boundaries, so it is deterministic at any parallelism — PROVIDED the
order key is unique (ties could straddle a range boundary and would
then be enumerated in partition-dependent order; use a composite key
to break ties, as with ``shard_plan``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _range_enumerated(
    df: DataFrame, cols: list[str], num_partitions: int
):
    """Shared two-phase layout for dense_ids/global_ntile: range
    partition on ``cols``, sort within partitions, PIN the layout
    (the range partitioner re-samples per action — the count job and
    the consumer job must see IDENTICAL partitions), then prefix-sum
    the per-partition counts on the driver (#partitions scalars —
    control plane). Returns (pinned_df, offsets_by_pid, total)."""
    parted = df.repartitionByRange(
        num_partitions, *[F.col(c) for c in cols]
    ).sortWithinPartitions(*cols)
    parted = parted.localCheckpoint(eager=True)
    counts = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = {r["pid"]: r["n"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    return parted, offsets, acc


def _with_appended_field(schema, name, dtype):
    from pyspark.sql import types as T

    # StructType.add MUTATES the receiver (it would corrupt the
    # DataFrame's cached schema object) — build a fresh StructType
    return T.StructType(
        list(schema.fields) + [T.StructField(name, dtype, False)]
    )


def dense_ids(
    df: DataFrame,
    order_col: str | list[str],
    out: str = "row_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Assign contiguous ids 0..n-1 in ``order_col`` order (which must
    be unique; pass a list for a composite total order). Two jobs: one
    to size the range partitions, one for the enumerated result."""
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    parted, offsets, _ = _range_enumerated(df, cols, num_partitions)

    from pyspark.sql import types as T

    schema_out = _with_appended_field(parted.schema, out, T.LongType())

    def enumerate_part(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            pdf[out] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(enumerate_part, schema=schema_out)


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    out: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY ...)`` without the single-partition
    global window — the distributed exact equi-depth bucketer.

    An empty-partition-spec ``ntile`` collapses the whole table onto
    one task (Spark's "No Partition Defined" scale killer). But the
    bucket of a row is pure arithmetic on its global rank: with
    n rows, k buckets, q = n div k, rem = n mod k, the SQL-standard
    ntile gives the first ``rem`` buckets q+1 rows and the rest q, so
    for 0-based rank r:

        bucket = r div (q+1) + 1                      if r < rem·(q+1)
        bucket = rem + (r − rem·(q+1)) div q + 1      otherwise

    So: two-phase range enumeration (the ``dense_ids`` recipe — range
    partition + in-partition sort + control-plane prefix sums) to get
    r, then the closed form above. Equivalence to ``F.ntile`` over the
    same total order is pytest-proven on randomized (n, k)
    (tests/test_scale_windows.py). ``order_cols`` must form a total
    order (unique composite) so ranks — and therefore buckets — are
    partition-independent.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    parted, offsets, n_total = _range_enumerated(
        df, list(order_cols), num_partitions
    )
    q, rem = divmod(n_total, n_buckets) if n_total else (0, 0)
    pivot = rem * (q + 1)  # first rank served by a size-q bucket

    from pyspark.sql import types as T

    schema_out = _with_appended_field(
        parted.schema, out, T.IntegerType()
    )

    def bucket_part(iterator):
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            r = np.arange(base + seen, base + seen + len(pdf))
            lo = r // (q + 1) + 1
            hi = rem + (np.maximum(r - pivot, 0) // max(q, 1)) + 1
            pdf[out] = np.where(r < pivot, lo, hi).astype("int32")
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(bucket_part, schema=schema_out)
