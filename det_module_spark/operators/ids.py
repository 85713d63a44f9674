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
    # one range partition must stay under 2^33 rows: the jvm rank
    # strategy packs (pid << 33) | row, and past the cap the row
    # counter bleeds into the pid bits and ranks corrupt SILENTLY
    # (the pandas enumerator would need an ~8.6-billion-row pandas
    # frame — equally mis-sized). Fail loudly with the fix.
    if sizes and max(sizes.values()) >= (1 << 33):
        raise ValueError(
            f"range layout holds {max(sizes.values())} rows in one "
            f"partition, >= 2^33 — raise num_partitions "
            f"(currently {num_partitions})"
        )
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


def _jvm_rank(parted: DataFrame, offsets: dict[int, int], out: str):
    """Rank over a PINNED sorted range layout, entirely JVM-side:
    ``monotonically_increasing_id`` encodes (partition id << 33) |
    in-partition row number over the checkpointed partitions, so the
    global rank is offsets[pid] + low bits — no Python crossing.
    The nondeterministic id is materialized once in its own
    projection (multiple references are multiple stateful instances;
    see global_ntile's note).

    The bit split caps a single partition at 2^33 rows: past that the
    per-partition counter bleeds into the pid bits and ranks corrupt
    SILENTLY. ``_range_enumerated`` enforces the cap loudly for both
    strategies (it holds the true per-partition sizes)."""
    num_partitions = max(offsets) + 1 if offsets else 1
    off_arr = F.array(
        *[F.lit(offsets.get(p, 0)) for p in range(num_partitions)]
    )
    staged = parted.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftrightunsigned(F.col("__mid"), 33).cast("int")
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return staged.withColumn(
        out, (F.element_at(off_arr, pid + 1) + local).cast("long")
    ).drop("__mid")


def dense_ids(
    df: DataFrame,
    order_col: str | list[str],
    out: str = "row_id",
    num_partitions: int = 32,
    strategy: str = "jvm",
) -> DataFrame:
    """Assign contiguous ids 0..n-1 in ``order_col`` order (which must
    be unique; pass a list for a composite total order). Two jobs: one
    to size the range partitions, one for the enumerated result.

    ``strategy="jvm"`` (the default) derives the id from
    monotonically_increasing_id over the pinned layout (pure Column
    arithmetic, no Arrow round-trip of the dataset — the scale path:
    a mapInPandas enumerator ships every row through a Python worker,
    ~30% at sf0.1 and a full corpus transfer at 100 TB; same trick as
    global_ntile); ``"pandas"`` keeps the original mapInPandas
    enumerator (results are identical — pinned by
    tests/test_scale_windows.py — only the physical plan differs)."""
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    parted, offsets, _ = _range_enumerated(df, cols, num_partitions)

    if strategy == "jvm":
        return _jvm_rank(parted, offsets, out)
    if strategy != "pandas":
        raise ValueError(f"unknown strategy {strategy!r}")

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

    The rank comes from the pinned range layout entirely JVM-side:
    ``monotonically_increasing_id`` over the checkpointed sorted
    partitions encodes (partition id << 33) | in-partition row
    number, so r = driver-side offset[pid] + low bits — no Python
    crossing of the dataset (the Arrow round-trip of a mapInPandas
    enumerator costs ~30% at sf0.1 and a full worker transfer of
    every row at scale). The nondeterministic id is materialized
    ONCE in its own projection: each reference is a separate
    stateful instance, and a reference inside a when/otherwise
    branch would silently desync its per-row counter on
    short-circuited rows (observed, and pinned by the randomized
    equivalence test in tests/test_scale_windows.py).

    All rank arithmetic is exact: ranks are int64 and the divisions
    are SQL ``div`` (true integer division — the float
    (x − x % d) / d identity is only exact below 2^53).
    Equivalence to ``F.ntile`` over the same total order is
    pytest-proven on randomized (n, k). ``order_cols`` must form a
    total order (unique composite) so ranks — and therefore
    buckets — are partition-independent.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    parted, offsets, n_total = _range_enumerated(
        df, list(order_cols), num_partitions
    )
    q, rem = divmod(n_total, n_buckets) if n_total else (0, 0)
    pivot = rem * (q + 1)  # first rank served by a size-q bucket
    qq = max(q, 1)

    staged = _jvm_rank(parted, offsets, "__r")
    # SQL `div` is true int64 division — the (x − x%d)/d float form
    # is only exact below 2^53, and this module's contract is exact
    # ranks at any size
    bucket = F.expr(
        f"CAST(CASE WHEN __r < {pivot}L THEN __r div {q + 1}L + 1 "
        f"ELSE {rem}L + greatest(__r - {pivot}L, 0L) div {qq}L + 1 "
        f"END AS INT)"
    )
    return staged.withColumn(out, bucket).drop("__r")


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out: str = "cumsum",
    num_partitions: int = 32,
    inclusive: bool = True,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY ...)`` without the single-partition
    global window — the distributed exact prefix sum, same two-phase
    recipe as :func:`dense_ids`/:func:`global_ntile`:

    1. range-partition on ``order_cols`` (a total order — unique
       composite), sort within partitions, PIN the layout;
    2. per-partition value totals → driver-side exclusive offsets
       (#partitions scalars — control plane);
    3. a window partitioned by the MATERIALIZED partition id (never
       an empty partition spec — each window partition is one range
       partition, bounded by the layout) gives the within-partition
       prefix; offset + prefix is the global cumulative sum.

    ``inclusive=False`` returns the exclusive prefix (sum of strictly
    earlier rows). ``value_col`` must be integral for an exact
    result (the contract of this module); the per-partition window
    sum is long arithmetic.
    """
    parted = df.repartitionByRange(
        num_partitions, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    parted = parted.localCheckpoint(eager=True).withColumn(
        "__pid", F.spark_partition_id()
    )
    per_part = (
        parted.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
    )  # control plane: #partitions scalar rows
    sums = {r["__pid"]: r["s"] or 0 for r in per_part}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sums.get(pid, 0)
    off_arr = F.array(
        *[F.lit(offsets.get(p, 0)) for p in range(num_partitions)]
    )
    from pyspark.sql import Window

    frame = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    local = F.coalesce(
        F.sum(F.col(value_col)).over(frame).cast("long"), F.lit(0)
    )
    return parted.withColumn(
        out,
        (F.element_at(off_arr, F.col("__pid") + 1) + local).cast("long"),
    ).drop("__pid")
