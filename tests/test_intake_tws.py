"""TWS upgrade of the request-intake tracker (round-8 growth item):
track_request_completion_tws must match the legacy
applyInPandasWithState path row-for-row on the same replay, and its
timer callback must evict (never re-arm) — the r7 intake contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from det_module_spark.streaming.intake import (
    RequestCompletionProcessor,
    track_request_completion,
    track_request_completion_tws,
)
from det_module_spark.streaming.replay import _ROCKSDB_CONF, replay_stream
from det_module_spark.streaming.state import HAS_TWS

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("batch", T.IntegerType(), False),
        T.StructField("request_id", T.StringType(), False),
        T.StructField("expected_items", T.IntegerType(), True),
        T.StructField("item_done", T.IntegerType(), False),
    ]
)

ROWS = [
    # req_a completes inside batch 0; a straggler arrives in batch 1
    # (state restarts at 0/0 -> pending, per the legacy contract)
    (0, "req_a", 2, 1),
    (0, "req_a", 2, 1),
    (1, "req_a", 2, 1),
    # req_b completes across batches
    (0, "req_b", 3, 1),
    (1, "req_b", 3, 2),
    # req_c never completes; NULL expected must not kill the query
    (0, "req_c", None, 1),
    (1, "req_c", 4, 1),
]


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+")
def test_tws_matches_legacy_tracker(spark):
    # the RocksDB provider reaches the replay through extra_conf —
    # replay_stream runs in a CHILD session that does not inherit
    # session conf set by a fixture on the parent
    df = spark.createDataFrame(ROWS, ITEM_SCHEMA)

    legacy = replay_stream(
        df, "batch", track_request_completion,
        output_mode="append", no_data_batches=False,
    )
    tws = replay_stream(
        df, "batch", track_request_completion_tws,
        output_mode="update", no_data_batches=False,
        extra_conf=_ROCKSDB_CONF,
    )
    key = lambda r: (r["request_id"], r["n_items"], r["status"])  # noqa: E731
    assert sorted(map(key, legacy.collect())) == sorted(
        map(key, tws.collect())
    )
    got = {(r["request_id"], r["status"]) for r in tws.collect()}
    assert ("req_b", "complete") in got
    assert ("req_c", "complete") not in got
    # complete exactly once per completion
    completes = [r for r in tws.collect() if r["status"] == "complete"]
    assert len([r for r in completes if r["request_id"] == "req_b"]) == 1


# ---------------------------------------------------------------
# timer-callback contract, unit-level (processing-time timers are
# wall-clock driven — the eviction path is exercised against stubs,
# the same approach the legacy tracker's timeout test uses)
# ---------------------------------------------------------------


class _StubValueState:
    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)

    def clear(self):
        self.value = None


class _StubHandle:
    def __init__(self):
        self.state = _StubValueState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)


class _StubTimerValues:
    def getCurrentProcessingTimeInMs(self):
        return 1_000


class _StubExpiredInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


def _feed(proc, pdf):
    import pandas as pd

    return list(
        proc.handleInputRows(("req_x",), iter([pdf]), _StubTimerValues())
    )


def test_timer_evicts_and_reports_once():
    import pandas as pd

    proc = RequestCompletionProcessor(idle_timeout_ms=500)
    h = _StubHandle()
    proc.init(h)
    _feed(proc, pd.DataFrame({"expected_items": [3], "item_done": [1]}))
    assert h.state.exists() and h.timers == [1_500]

    out = list(
        proc.handleExpiredTimer(
            ("req_x",), _StubTimerValues(), _StubExpiredInfo(1_500)
        )
    )
    assert len(out) == 1
    assert out[0]["status"].iloc[0] == "timeout"
    assert out[0]["n_items"].iloc[0] == 1
    # EVICTED: state gone, no re-arm beyond the original registration
    assert not h.state.exists()
    assert h.timers == [1_500]  # nothing new registered by the expiry

    # a second (stale) fire emits nothing
    assert (
        list(
            proc.handleExpiredTimer(
                ("req_x",), _StubTimerValues(), _StubExpiredInfo(1_500)
            )
        )
        == []
    )


def test_completion_clears_state_and_timer():
    import pandas as pd

    proc = RequestCompletionProcessor(idle_timeout_ms=500)
    h = _StubHandle()
    proc.init(h)
    _feed(proc, pd.DataFrame({"expected_items": [2], "item_done": [1]}))
    assert h.timers == [1_500]
    out = _feed(
        proc, pd.DataFrame({"expected_items": [2], "item_done": [1]})
    )
    assert out[0]["status"].iloc[0] == "complete"
    assert not h.state.exists()
    assert h.timers == []  # completion deleted the live timer


def test_stale_timer_does_not_evict_live_state():
    import pandas as pd

    proc = RequestCompletionProcessor(idle_timeout_ms=500)
    h = _StubHandle()
    proc.init(h)
    _feed(proc, pd.DataFrame({"expected_items": [3], "item_done": [1]}))
    # an expiry for a timestamp the state does NOT consider live
    assert (
        list(
            proc.handleExpiredTimer(
                ("req_x",), _StubTimerValues(), _StubExpiredInfo(999)
            )
        )
        == []
    )
    assert h.state.exists()
