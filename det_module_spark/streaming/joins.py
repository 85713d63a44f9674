"""Stream-stream joins with watermarked state.

Joining two live streams requires both sides to buffer state; the
interval condition + watermarks bound that state: a row can be evicted
once the other stream's watermark passes the end of its join window.
Without the interval bound the state grows forever — so, like the
window builders, this module makes the bounds mandatory on streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """left ⋈ right on key with right_ts ∈ [left_ts − 0, left_ts + upper]
    — "views following a click within N minutes". Works identically in
    batch mode (the interval is just a predicate there)."""
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond)
