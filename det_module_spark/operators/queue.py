"""Request-queue semantics as DataFrame operators.

The reference polls a Mongo queue (queue/request_tools.py:87); the
operators it uses are plain relational ops re-expressed here:

- S1 ``get_requests``: status filter → priority-desc, submit-time-asc
  (FIFO) ordering → limit (queue/request_tools.py:110-129);
- S2/S3 ``check_id`` / ``get_status``: point lookup by id with
  projection (queue/request_tools.py:97-147);
- O3 two-phase poll: status −1 batch before status 0 batch
  (queue/processing.py:121-123);
- E4 status transitions −1 new → 2 processing → 1 complete / 0 waiting
  / −2 error with stage timestamps (queue/processing.py:144-216).

At scale the queue table is a Delta table and the point ops are
key-partition-pruned reads; the logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_ERROR = -2
STATUS_NEW = -1
STATUS_WAITING = 0
STATUS_DONE = 1
STATUS_PROCESSING = 2


def get_requests(
    queue: DataFrame,
    status: int,
    limit: int = 0,
    status_col: str = "status",
    priority_col: str = "priority",
    submit_time_col: Column | str = "submit_time",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Priority-desc / FIFO-asc queue scan with optional limit
    (``limit(0)`` = unlimited, matching request_tools.py:110-122).

    ``tiebreak_col`` (a unique key) makes the scan order total — the
    reference relies on Mongo's stable order; a distributed engine must
    make determinism explicit.
    """
    order = [F.desc(priority_col), F.asc(submit_time_col)]
    if tiebreak_col:
        order.append(F.asc(tiebreak_col))
    out = queue.filter(F.col(status_col) == status).orderBy(*order)
    if limit and limit > 0:
        out = out.limit(limit)
    return out


def two_phase_poll(
    queue: DataFrame, first_status: int = STATUS_NEW,
    second_status: int = STATUS_WAITING, **kwargs
) -> DataFrame:
    """O3 — new requests take absolute precedence over waiting ones
    (processing.py:121-123): union of the two ordered scans with a
    phase rank so downstream consumption preserves the precedence."""
    a = get_requests(queue, first_status, **kwargs).withColumn(
        "poll_phase", F.lit(0)
    )
    b = get_requests(queue, second_status, **kwargs).withColumn(
        "poll_phase", F.lit(1)
    )
    return a.unionByName(b)


def check_id(queue: DataFrame, rid, id_col: str = "_id") -> DataFrame:
    """S2 — point lookup; empty result means unknown id
    (request_tools.py:97-107)."""
    return queue.filter(F.col(id_col) == rid).limit(1)


def get_status(queue: DataFrame, rid, id_col: str = "_id") -> DataFrame:
    """S3 — one field of one row (request_tools.py:132-147)."""
    return check_id(queue, rid, id_col).select("status")


def update_status(
    queue: DataFrame, rid, new_status: int, stage: str | None = None,
    now: int = 0, id_col: str = "_id",
) -> DataFrame:
    """K6/E4 — status transition + stage timestamp as a declarative
    column rewrite; on Delta this is the same expression inside
    ``MERGE INTO ... WHEN MATCHED UPDATE`` (request_tools.py:150-190)."""
    hit = F.col(id_col) == rid
    out = queue.withColumn(
        "status", F.when(hit, F.lit(new_status)).otherwise(F.col("status"))
    )
    if stage is not None:
        out = out.withColumn(
            f"stage_{stage}_time",
            F.when(hit, F.lit(now)).otherwise(
                F.col(f"stage_{stage}_time")
                if f"stage_{stage}_time" in queue.columns
                else F.lit(None).cast("long")
            ),
        )
    return out
