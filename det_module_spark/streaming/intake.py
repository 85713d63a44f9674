"""Streaming request intake — the reference's polling loop, re-founded.

The reference cron-polls a Mongo queue and re-checks every request's
items until all are cached (queue/processing.py:113-216). As a stream:
item-completion events flow in keyed by request id; per-key state
tracks how many items remain; when the count hits zero the request is
emitted as complete. ``applyInPandasWithState`` holds the per-request
counter — bounded state (one tiny row per in-flight request), evicted
on completion or timeout.

Works identically under ``trigger(availableNow=True)`` for catch-up
batch runs — the cron cadence becomes a trigger choice, not a
different program.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COMPLETION_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), False),
        T.StructField("n_items", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # complete|pending
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("expected", T.IntegerType(), True),
        T.StructField("done", T.IntegerType(), True),
    ]
)


def _completion_update(idle_timeout_ms: int):
    """Build the per-group state-update function (module-level so its
    timeout/NULL semantics are unit-testable against a state stub
    without driving a wall-clock stream)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (request_id,) = key
        expected, done = state.get if state.exists else (0, 0)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "request_id": [request_id],
                    "n_items": [done],
                    "status": ["timeout"],
                }
            )
            return
        for pdf in pdfs:
            if len(pdf):
                # NULL expected_items must not kill the query:
                # max() over an all-NULL batch is NaN and int(NaN)
                # raises — skip the update instead (sum() already
                # skips NaN per-row)
                exp_max = pdf["expected_items"].max()
                if pd.notna(exp_max):
                    expected = max(expected, int(exp_max))
                done += int(pdf["item_done"].sum())
        complete = expected > 0 and done >= expected
        if complete:
            state.remove()
        else:
            state.update((expected, done))
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "request_id": [request_id],
                "n_items": [done],
                "status": ["complete" if complete else "pending"],
            }
        )

    return update


def track_request_completion(
    item_events: DataFrame,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """item_events: streaming DF with columns
    (request_id string, expected_items int, item_done int).

    Emits one row per state change; ``status='complete'`` exactly once
    per request when done == expected. With ``idle_timeout_ms`` set, a
    request whose state times out is EVICTED and reported once with
    ``status='timeout'`` (the docstring contract: state is bounded by
    in-flight requests — re-arming the timer on the timeout callback
    would leak every abandoned request's state forever).
    """
    return item_events.groupBy("request_id").applyInPandasWithState(
        _completion_update(idle_timeout_ms),
        outputStructType=COMPLETION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------
# TWS upgrade path (transformWithStateInPandas, Spark 4+)
# ---------------------------------------------------------------------
#
# Same contract as track_request_completion, on the successor API the
# rest of streaming/ already uses (state.py): per-request ValueState,
# processing-time timers for idle eviction (state stays bounded by
# in-flight requests), one status row per state change, 'complete'
# exactly once. The legacy applyInPandasWithState entry point above is
# kept — it is the API a Spark 3.x reader of this module expects — but
# new code should take this one: TWS gives named state variables in
# their own column families, composable timers, and the same processor
# can later grow ListState/MapState without an output-schema rewrite.

from det_module_spark.streaming.state import (  # noqa: E402
    HAS_TWS,
    StatefulProcessor,
    StatefulProcessorHandle,
    _ship_fallback,
)

_TWS_REQ_STATE = T.StructType(
    [
        T.StructField("expected", T.LongType()),
        T.StructField("done", T.LongType()),
        T.StructField("timer", T.LongType()),  # -1 = no live timer
    ]
)


class RequestCompletionProcessor(StatefulProcessor):
    """Per-request completion counter with idle-timeout eviction.

    State: one (expected, done, live_timer) row per in-flight request.
    A request is emitted 'complete' exactly once when done >= expected
    (> 0) and its state cleared; with a timeout configured, a live
    processing-time timer is (re)armed on every update and an expiry
    EVICTS the state and reports the request once as 'timeout' —
    never re-arms (the r7 intake fix's contract: re-arming leaks every
    abandoned request's state forever).
    """

    def __init__(self, idle_timeout_ms: int = 0) -> None:
        self._timeout = idle_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._s = handle.getValueState("req", _TWS_REQ_STATE)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        expected, done, timer = 0, 0, -1
        if self._s.exists():
            expected, done, timer = (int(x) for x in self._s.get())
        for pdf in rows:
            if len(pdf):
                exp_max = pdf["expected_items"].max()
                if pd.notna(exp_max):
                    expected = max(expected, int(exp_max))
                done += int(pdf["item_done"].sum())
        complete = expected > 0 and done >= expected
        if complete:
            if timer >= 0:
                self._h.deleteTimer(timer)
            self._s.clear()
        else:
            new_timer = -1
            if self._timeout:
                if timer >= 0:
                    self._h.deleteTimer(timer)
                new_timer = (
                    timerValues.getCurrentProcessingTimeInMs()
                    + self._timeout
                )
                self._h.registerTimer(new_timer)
            self._s.update((expected, done, new_timer))
        yield pd.DataFrame(
            {
                "request_id": [key[0]],
                "n_items": [done],
                "status": ["complete" if complete else "pending"],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        if self._s.exists():
            done, timer = (
                int(self._s.get()[1]),
                int(self._s.get()[2]),
            )
            # only honor the timer the state believes is live (a
            # deleted timer must not double-evict)
            if expiredTimerInfo.getExpiryTimeInMs() == timer:
                self._s.clear()
                yield pd.DataFrame(
                    {
                        "request_id": [key[0]],
                        "n_items": [done],
                        "status": ["timeout"],
                    }
                )

    def close(self) -> None:
        pass


def track_request_completion_tws(
    item_events: DataFrame,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """``track_request_completion`` on transformWithStateInPandas —
    identical input/output contract (same COMPLETION_SCHEMA, same
    emission rules; equivalence + timer-eviction semantics pinned by
    tests/test_intake_tws.py)."""
    _ship_fallback(item_events.sparkSession)
    return item_events.groupBy("request_id").transformWithStateInPandas(
        statefulProcessor=RequestCompletionProcessor(idle_timeout_ms),
        outputStructType=COMPLETION_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if idle_timeout_ms else "None",
    )
