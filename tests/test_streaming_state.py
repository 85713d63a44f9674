"""transformWithStateInPandas running totals: state survives across
micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from det_module_spark.streaming.state import HAS_TWS, running_totals

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs Spark 4+ and protobuf")
def test_running_totals_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(
        [Row(event_type="a", value=1.0), Row(event_type="a", value=2.0),
         Row(event_type="b", value=5.0)],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = {r.key: (r.n_events, r.sum_value)
             for r in spark.sql("SELECT * FROM tws_totals").collect()}
    assert first == {"a": (2, 3.0), "b": (1, 5.0)}

    # second batch: state must carry the previous totals forward
    spark.createDataFrame(
        [Row(event_type="a", value=10.0)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    q2 = (
        running_totals(stream2)
        .writeStream.format("memory")
        .queryName("tws_totals2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = {r.key: (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM tws_totals2").collect()}
    assert rows["a"] == (12, 13.0)
