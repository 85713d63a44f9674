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
