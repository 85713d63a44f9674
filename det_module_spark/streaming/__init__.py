"""Streaming layer: event-time windows + stateful request intake."""

from det_module_spark.streaming.windows import (
    tumbling_agg,
    sliding_agg,
    session_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg"]
