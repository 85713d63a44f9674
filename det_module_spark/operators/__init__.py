"""Operator layer: zonal aggregates, MSR, spatial join, merge, LLM ops."""

from det_module_spark.operators.extract_types import (
    EXTRACT_TYPES,
    extract_abbr,
    validate_extract_type,
    zonal_extract,
)

__all__ = [
    "EXTRACT_TYPES",
    "extract_abbr",
    "validate_extract_type",
    "zonal_extract",
]
