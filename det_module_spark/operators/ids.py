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


def dense_ids(
    df: DataFrame,
    order_col: str,
    out: str = "row_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Assign contiguous ids 0..n-1 in ``order_col`` order (which must
    be unique). Two jobs: one to size the range partitions, one for
    the enumerated result."""
    parted = df.repartitionByRange(
        num_partitions, F.col(order_col)
    ).sortWithinPartitions(order_col)
    # pin the range boundaries: the count job and the enumerate job
    # must see IDENTICAL partitions, and the range partitioner
    # re-samples per action otherwise
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

    from pyspark.sql import types as T

    # StructType.add MUTATES the receiver (it would corrupt the
    # DataFrame's cached schema object) — build a fresh StructType
    schema_out = T.StructType(
        list(parted.schema.fields)
        + [T.StructField(out, T.LongType(), False)]
    )

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
