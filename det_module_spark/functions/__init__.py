"""Scalar-function layer: canonical hashing, string/temporal helpers."""

from det_module_spark.functions.hashing import canonical_json, spec_hash, hash7
from det_module_spark.functions.strings import (
    temporal_suffix,
    temporal_token,
    normalize_temporal,
    version_key,
)

__all__ = [
    "canonical_json",
    "spec_hash",
    "hash7",
    "temporal_suffix",
    "temporal_token",
    "normalize_temporal",
    "version_key",
]
