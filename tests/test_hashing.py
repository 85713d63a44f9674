"""Pin the canonical-hash bytes (SURVEY.md 'hard list' (a)).

The cache key must be byte-compatible with the reference's
``json.dumps(obj, sort_keys=True, ensure_ascii=True,
separators=(', ', ': '))`` -> sha1 (queue/request_tools.py:37-45).
"""

import hashlib

from det_module_spark.functions.hashing import canonical_json, hash7, spec_hash


def test_canonical_json_bytes():
    obj = {"b": [1, 2], "a": {"y": None, "x": "é"}}
    # key-sorted, ascii-escaped, ', ' and ': ' separators — exactly
    # Py2 json.dumps defaults
    assert (
        canonical_json(obj)
        == '{"a": {"x": "\\u00e9", "y": null}, "b": [1, 2]}'
    )


def test_spec_hash_golden():
    spec = {
        "dataset": "worldbank_geocodedresearchrelease_level1_v1_4_1",
        "type": "release",
        "resolution": 0.05,
        "version": "0.1",
        "filters": {"donors": ["World Bank"], "years": ["2002"]},
    }
    expected = hashlib.sha1(canonical_json(spec).encode()).hexdigest()
    assert spec_hash(spec) == expected
    # stability: same dict in a different insertion order hashes the same
    shuffled = dict(reversed(list(spec.items())))
    assert spec_hash(shuffled) == expected


def test_hash7():
    assert hash7("abcdef0123456789") == "abcdef0"
