"""transformWithStateInPandas running totals: state survives across
micro-batches (and across a query restart from the checkpoint).

This is a REAL end-to-end execution of Spark's TWS path: the Python
state clients speak the protobuf wire protocol to the JVM state
server — via the real google.protobuf when installed, else the
vendored pure-Python runtime (vendor/protofallback, unit-tested in
test_protofallback.py). TWS stores each state variable in its own
column family, so the bundled RocksDB state-store provider is pinned
for the test (HDFS-backed provider: single column family only).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from det_module_spark.streaming.state import HAS_TWS, running_totals

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def rocksdb_state(spark):
    """transformWithState keeps each state variable in its own column
    family, which the default HDFS-backed provider cannot do — pin the
    bundled RocksDB provider for the duration of the test."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+")
def test_running_totals_across_batches(spark, tmp_path, rocksdb_state):
    src = tmp_path / "ev"
    out = tmp_path / "out"
    src.mkdir()
    spark.createDataFrame(
        [Row(event_type="a", value=1.0), Row(event_type="a", value=2.0),
         Row(event_type="b", value=5.0)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    # memory sinks cannot recover from a checkpoint; foreachBatch can,
    # which is what lets the second run resume the SAME query and
    # prove the state survived the restart.
    def sink(bdf, bid):
        bdf.withColumn("batch_id", F.lit(bid)).write.mode(
            "append"
        ).parquet(str(out))

    def run_once():
        q = (
            running_totals(
                spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(str(out))
    first = {
        r["key"]: (r["n_events"], r["sum_value"]) for r in got.collect()
    }
    assert first == {"a": (2, 3.0), "b": (1, 5.0)}

    # second batch: the restarted query must carry the previous totals
    # forward out of the state store
    spark.createDataFrame(
        [Row(event_type="a", value=10.0)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    latest = (
        spark.read.parquet(str(out))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.desc("batch_id"))
            ),
        )
        .filter("rn = 1")
    )
    rows = {
        r["key"]: (r["n_events"], r["sum_value"]) for r in latest.collect()
    }
    # a: 2 prior events (sum 3.0) + 1 new (10.0) -> (3, 13.0); b
    # untouched in batch 2, so its latest row is still batch 0's
    assert rows == {"a": (3, 13.0), "b": (1, 5.0)}


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+")
def test_timers_and_ttl_protocol(spark, tmp_path, rocksdb_state):
    """Exercises the remaining state-protocol families end-to-end:
    timer register/list/delete (ProcessingTime mode) and ValueState
    with a TTL config (1h — state must survive within the horizon).

    A TWS query in ProcessingTime mode keeps scheduling timer-check
    micro-batches even under trigger(availableNow) — it never
    self-terminates (with a PENDING timer it also burns a state-store
    version per tick; observed 80+). So: wait for the first batch's
    output, then stop() the query explicitly."""
    import pandas as pd

    from det_module_spark.streaming.state import (
        StatefulProcessor,
        _ship_fallback,
    )

    class TimerEcho(StatefulProcessor):
        def init(self, handle):
            self._h = handle
            self._seen = handle.getValueState(
                "seen", "n BIGINT", ttlDurationMs=3_600_000
            )

        def handleInputRows(self, key, rows, timerValues):
            far = timerValues.getCurrentProcessingTimeInMs() + 86_400_000
            self._h.registerTimer(far)
            self._h.registerTimer(far + 1000)
            self._h.deleteTimer(far + 1000)
            timers = list(self._h.listTimers())
            self._h.deleteTimer(far)  # leave none pending (see above)
            prev = self._seen.get() if self._seen.exists() else (0,)
            n = int(prev[0]) + sum(len(p) for p in rows)
            self._seen.update((n,))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "n_timers": [len(timers)]}
            )

        def close(self):
            pass

    src = tmp_path / "ev"
    out = tmp_path / "out"
    src.mkdir()
    spark.createDataFrame(
        [Row(event_type="a", value=1.0), Row(event_type="a", value=2.0)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))
    _ship_fallback(spark)

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(str(out))

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    prepared = stream.select(
        F.col("event_type").cast("string").alias("key"),
        F.col("value").cast("double").alias("value"),
    )
    q = (
        prepared.groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=TimerEcho(),
            outputStructType="key string, n long, n_timers long",
            outputMode="Update",
            timeMode="ProcessingTime",
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import glob
    import time

    deadline = time.time() + 120
    while time.time() < deadline and not glob.glob(
        str(out / "part-*.parquet")
    ):
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    rows = {r["key"]: (r["n"], r["n_timers"])
            for r in spark.read.parquet(str(out)).collect()}
    # 2 events counted through the TTL'd ValueState; exactly one
    # timer survives the register/register/delete sequence
    assert rows == {"a": (2, 1)}


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+")
def test_session_flush_event_time_timers(spark):
    """Crafted corpus hitting all three session outcomes: closed by
    DATA (gap jumped by a later event), closed by the WATERMARK (timer
    fires — handleExpiredTimer), and left OPEN (last event too close
    to the final watermark: never emitted)."""
    from datetime import datetime, timedelta

    from det_module_spark.streaming.replay import replay_session_flush

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(key, minutes, batch):
        return Row(key=key, ts=t0 + timedelta(minutes=minutes), batch=batch)

    rows = [
        # key a: session 1 = 2 events, then an 80-min gap (> 60) jumps
        # it closed; session 2 = 1 event, 200 min before the end —
        # watermark (max - 30min) passes end+60min -> timer-closed
        ev("a", 0, 0), ev("a", 10, 0), ev("a", 90, 1),
        # key b: single session ending 20 min before max ts: watermark
        # = max-30 < end+60 -> stays open, never emitted
        ev("b", 270, 2), ev("b", 280, 2),
        # the clock setter: defines max ts = 300min
        ev("c", 150, 1), ev("c", 300, 2),
    ]
    df = spark.createDataFrame(rows)
    out = replay_session_flush(
        df, "batch", "key", "ts", gap_ms=3_600_000, watermark="30 minutes"
    )
    got = {
        (r["key"], r["n_events"], r["end_ms"])
        for r in out.collect()
    }
    ms = lambda m: int((t0 + timedelta(minutes=m)).timestamp() * 1000)  # noqa: E731
    assert got == {
        ("a", 2, ms(10)),   # data-closed (gap to t=90)
        ("a", 1, ms(90)),   # timer-closed (90+60=150 <= wm 270)
        ("c", 1, ms(150)),  # data-closed (gap to t=300)
        # b's session (end 280; 280+60=340 > wm 270) and c's last
        # event (300+60 > 270) stay open: absent
    }


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+")
def test_initial_state_seeding(spark, tmp_path, rocksdb_state):
    """handleInitialState: seed per-key running totals from a BATCH
    DataFrame (e.g. a backfill of historical aggregates) before the
    first micro-batch — the migration path from a batch rollup to the
    streaming one, and the last piece of the TWS API surface."""
    import pandas as pd

    from det_module_spark.streaming.state import (
        RUNNING_SCHEMA,
        RunningTotalsProcessor,
        _ship_fallback,
    )

    class Seeded(RunningTotalsProcessor):
        def handleInitialState(self, key, initialState, timerValues):
            n = int(initialState["n_events"].iloc[0])
            s = float(initialState["sum_value"].iloc[0])
            self._state.update((n, s))

    src = tmp_path / "ev"
    out = tmp_path / "out"
    src.mkdir()
    spark.createDataFrame(
        [Row(event_type="a", value=2.0), Row(event_type="c", value=7.0)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))
    _ship_fallback(spark)
    # backfill: a already saw 5 events summing 100; b saw 1 at 9
    init = (
        spark.createDataFrame(
            [Row(key="a", n_events=5, sum_value=100.0),
             Row(key="b", n_events=1, sum_value=9.0)]
        ).groupBy("key")
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    prepared = stream.select(
        F.col("event_type").cast("string").alias("key"),
        F.col("value").cast("double").alias("value"),
    )
    q = (
        prepared.groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=Seeded(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
            initialState=init,
        )
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(str(out))
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r["key"]: (r["n_events"], r["sum_value"])
            for r in spark.read.parquet(str(out)).collect()}
    # a: seeded (5,100) + 1 new event of 2.0; c: unseeded, fresh.
    # b: seeded but no stream data in batch 0 -> whether it emits is
    # engine-defined; assert only on keys that saw data.
    assert rows["a"] == (6, 102.0)
    assert rows["c"] == (1, 7.0)
