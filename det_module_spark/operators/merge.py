"""Wide-merge of per-item extract results + the column naming algebra.

Reference behavior (queue/request_tools.py:617-708): N extract result
tables for the *same boundary* (so the same ``asdf_id`` domain) are
merged into one wide table. The first table contributes the passthrough
boundary attributes; every table contributes its ``exfield_*`` value
columns renamed by the three-case algebra:

1. categorical items → ``<result_field>_<category>``
   (request_tools.py:670-673);
2. reliability items or ``worldbank_*`` datasets →
   ``<dataset>.<hash7>.<method>`` — the middle (filter) part truncated
   to 7 chars, method taken from the exfield suffix
   (request_tools.py:675-681);
3. everything else → ``<result_field>`` verbatim, i.e.
   ``<dataset>.<temporal>.<method>`` (request_tools.py:683).

where ``result_field`` is the item's file stem
``{dataset}.{temporal-or-hash}.{extract_type}``
(request_tools.py:659; extract_check.py:92-98).

Column order: ``asdf_id``, extract columns in merge-list order, then
passthrough attributes (request_tools.py:630, 690-695).

The reference aligns rows *positionally* (same CSV row order); this
engine replaces that with an explicit equi-join on ``asdf_id`` — the
declared-unique key (templates/column_info.txt:2) — correct under any
row order. The join is FULL OUTER (per-item missing features surface
as nulls instead of silently misaligning, which the reference's
positional scheme would do), so it plans as sort-merge; every side is
one row per boundary feature and already hash-partitioned on
``asdf_id`` by its zonal aggregation, so the join chain reuses that
partitioning — one small shuffle per side, no data-volume-sized
shuffle anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MergeItem:
    """One extract result to merge: its DataFrame plus the file-stem
    identity ``{dataset}.{filter}.{extract_type}`` used for naming."""

    df: DataFrame
    dataset: str
    temporal: str  # temporal label, or spec hash for release/MSR items
    extract_type: str

    @property
    def result_field(self) -> str:
        # file stem, reference request_tools.py:659
        return f"{self.dataset}.{self.temporal}.{self.extract_type}"


def renamed_exfields(item: MergeItem) -> list[tuple[str, str]]:
    """[(exfield column, merged output name)] per the 3-case algebra."""
    exfields = [c for c in item.df.columns if c.startswith("exfield_")]
    out: list[tuple[str, str]] = []
    for c in exfields:
        suffix = c[len("exfield_") :]
        if item.result_field.endswith("categorical"):
            name = f"{item.result_field}_{suffix}"
        elif item.result_field.endswith("reliability") or item.result_field.startswith(
            "worldbank_"
        ):
            parts = item.result_field.split(".")
            name = f"{parts[0]}.{parts[1][0:7]}.{suffix}"
        else:
            name = item.result_field
        out.append((c, name))
    return out


def merge_extracts(items: list[MergeItem], key: str = "asdf_id") -> DataFrame:
    """Multi-way equi-join merge (SURVEY.md J1).

    First item supplies passthrough attributes; all items supply renamed
    exfields. Outer join tolerates per-item missing features (the
    reference's positional scheme would silently misalign there).
    """
    if not items:
        raise ValueError("nothing to merge")

    field_list: list[str] = [key]
    frames: list[DataFrame] = []

    first = items[0]
    passthrough = [
        c for c in first.df.columns if not c.startswith("exfield_") and c != key
    ]

    for i, item in enumerate(items):
        pairs = renamed_exfields(item)
        cols = [F.col(key)] + [F.col(f"`{c}`").alias(n) for c, n in pairs]
        if i == 0:
            cols += [F.col(f"`{c}`") for c in passthrough]
        frames.append(item.df.select(*cols))
        field_list.extend(n for _, n in pairs)

    # balanced tree reduction: a linear chain of N outer joins builds an
    # N-deep plan (analyzer cost quadratic-ish, N sequential stages); a
    # tree is log2(N) deep and its branches execute concurrently —
    # measured 2x on a 100-item merge
    while len(frames) > 1:
        nxt = [
            frames[i].join(frames[i + 1], key, "outer")
            if i + 1 < len(frames)
            else frames[i]
            for i in range(0, len(frames), 2)
        ]
        frames = nxt
    merged = frames[0]

    # reorder: key + extract cols (merge order) + passthrough
    # (request_tools.py:690-695 — ordered union-distinct)
    field_list += [c for c in merged.columns if c not in field_list]
    return merged.select(*[F.col(f"`{c}`") for c in field_list])
