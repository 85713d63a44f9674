"""SparkSession factory tuned for this engine.

Local test mode runs ``local[N]``; the same config scales to a real
cluster because everything here is declarative (AQE, Arrow, shuffle
partitions). At 100 TB the only knobs expected to change are
``spark.sql.shuffle.partitions`` (to ~2-3x total cores) and
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "det_module_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    AQE is on so runtime statistics re-plan skewed joins and coalesce
    post-shuffle partitions; Arrow is on so every pandas_udf crossing
    is batched, not row-at-a-time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/det_module_spark_warehouse"
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_spark_with_retries(
    app_name: str = "det_module_spark",
    master: str | None = None,
    attempts: int = 5,
    backoff_s: float = 1.0,
) -> SparkSession:
    """Bootstrap with bounded retries (reference parity: the ≤5-attempt
    config retry loop, queue/processing.py:37-42) — transient JVM/port
    contention at startup shouldn't fail a cron-style run."""
    import time

    last: Exception | None = None
    for i in range(attempts):
        try:
            return get_spark(app_name, master)
        except Exception as e:  # noqa: BLE001 - bootstrap only
            last = e
            time.sleep(backoff_s * (i + 1))
    raise RuntimeError(f"SparkSession bootstrap failed after {attempts} attempts") from last
