"""Content-addressed spec hashing.

The reference memoizes work items by the SHA-1 of a canonical JSON
serialization of the item spec (reference: queue/request_tools.py:37-45):
``json.dumps(obj, sort_keys=True, ensure_ascii=True,
separators=(', ', ': '))`` → sha1 hexdigest. Byte-exact reproduction
matters: two engines agreeing on the canonicalization share a cache.

Driver-side (plan-time) hashing is plain Python; data-plane hashing of
spec columns uses ``F.sha1(F.to_json(...))`` which Spark canonicalizes
differently — so *plan* hashes are always computed with this module and
carried into DataFrames as literal columns.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

# Exact separators used by the reference (json.dumps defaults in Py2):
# item separator ", " and key separator ": ".
_SEPARATORS = (", ", ": ")


def canonical_json(obj: Any) -> str:
    """Canonical JSON: sorted keys, ascii-escaped, fixed separators.

    Reference parity: queue/request_tools.py:41 (json.dumps with
    sort_keys=True and default Py2 separators).
    """
    return json.dumps(obj, sort_keys=True, ensure_ascii=True, separators=_SEPARATORS)


def spec_hash(obj: Any) -> str:
    """SHA-1 hex digest of the canonical JSON of ``obj``.

    Reference parity: queue/request_tools.py:37-45 (``json_sha1_hash``).
    """
    return hashlib.sha1(canonical_json(obj).encode("utf-8")).hexdigest()


def hash7(digest: str) -> str:
    """7-char hash prefix used in column names and mail subjects.

    Reference parity: queue/request_tools.py:260,287,679.
    """
    return digest[:7]
