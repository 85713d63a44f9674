"""Custom stateful streaming processors (Spark 4.x transformWithState).

``transformWithStateInPandas`` is the arbitrary-state successor to
``applyInPandasWithState`` (used by streaming/intake.py): typed state
variables (ValueState/ListState/MapState), optional TTL, and timers.
Here it powers a per-key running aggregate with a bounded-state
contract — the building block the reference's request tracker needs
when requests never stop arriving (state TTL evicts abandoned keys
instead of growing forever).

Scale shape: state lives in the state store partitioned by key —
parallel across executors, checkpointed incrementally; the Python hook
sees Arrow batches per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # Spark >= 4.0, plus protobuf (the state-server wire protocol —
    # NOT bundled in this container; same import-gate pattern as
    # rasterio/shapely. applyInPandasWithState (streaming/intake.py)
    # remains the tested stateful path here.)
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark / no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TWS = False

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum): emits the updated totals once per
    key per micro-batch. State is one ValueState row per key, with TTL
    when the caller configures it."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, s = 0, 0.0
        if self._state.exists():
            prev = self._state.get()
            n, s = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._state.update((n, s))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key running totals via transformWithStateInPandas.
    Works on a streaming DataFrame; each micro-batch emits the new
    running (count, sum) for every key it touched."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
