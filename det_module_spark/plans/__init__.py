"""Plan layer: request spec → normalized plan → work items → cache diff."""

from det_module_spark.plans.spec import (
    normalize_filters,
    validate_request,
    msr_spec,
    effective_extract_type,
)
from det_module_spark.plans.planner import expand_request, ITEM_SCHEMA
from det_module_spark.plans.cache import CacheManifest

__all__ = [
    "normalize_filters",
    "validate_request",
    "msr_spec",
    "effective_extract_type",
    "expand_request",
    "ITEM_SCHEMA",
    "CacheManifest",
]
