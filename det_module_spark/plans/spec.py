"""Request-spec validation and normalization (plan-time rules).

The request document *is* the query plan in the reference
(SURVEY.md §3.1). These rules run before hashing, because the
content-addressed cache key is the SHA-1 of the normalized spec —
normalization order is semantics (queue/request_tools.py:362-383).
"""

from __future__ import annotations

from typing import Any

from det_module_spark.functions.hashing import spec_hash

# queue/request_tools.py:65
MSR_RESOLUTION = 0.05


def validate_request(request: dict[str, Any]) -> bool:
    """P1 — a request must have a boundary and at least one of
    release_data / raster_data (queue/processing.py:144-147).

    Malformed shapes VALIDATE FALSE rather than crash: a request with
    ``boundary: None`` (key present) or a non-dict boundary is
    invalid, not an AttributeError — callers rely on the documented
    invalid-request error path."""
    boundary = request.get("boundary")
    has_boundary = isinstance(boundary, dict) and bool(boundary.get("name"))
    has_data = bool(request.get("release_data")) or bool(request.get("raster_data"))
    return has_boundary and has_data


def normalize_filters(filters: dict[str, list] | None) -> dict[str, list]:
    """P2 — drop filter entries whose value list contains a no-op
    marker ('All' / 'None' / None), *before* hashing
    (queue/request_tools.py:362-369). This is the reference's
    no-op-predicate pruning and it changes the cache key."""
    if not filters:
        return {}
    return {
        fk: fv
        for fk, fv in filters.items()
        if not any(fvx in ("All", "None", None) for fvx in fv)
    }


def msr_spec(
    dataset: str,
    filters: dict[str, list] | None,
    version: str = "0.1",
    resolution: float = MSR_RESOLUTION,
) -> dict[str, Any]:
    """The canonical MSR work-item spec whose hash is the cache key
    (queue/request_tools.py:373-380)."""
    return {
        "dataset": dataset,
        "type": "release",
        "resolution": resolution,
        "version": version,
        "filters": normalize_filters(filters),
    }


def msr_hash(dataset: str, filters: dict[str, list] | None, version: str = "0.1") -> str:
    return spec_hash(msr_spec(dataset, filters, version))


def effective_extract_type(dataset: str, requested: str = "reliability") -> str:
    """P9 — ``worldbank_*`` release datasets get a plain ``sum``
    extract, not the reliability triple
    (queue/request_tools.py:411-414, documentation_tool.py:258-261)."""
    if dataset.startswith("worldbank_"):
        return "sum"
    return requested
