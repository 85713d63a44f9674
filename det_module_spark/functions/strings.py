"""String/temporal helpers from the reference's naming conventions."""

from __future__ import annotations


def temporal_suffix(file_name: str, dataset_name: str) -> str:
    """Temporal step encoded in a raster file name: everything after
    ``<dataset>_``. Reference parity: queue/request_tools.py:467
    (``name[len(dataset)+1:]``).
    """
    return file_name[len(dataset_name) + 1 :]


def temporal_token(name: str) -> str:
    """Last ``_``-separated token of a file name — the temporal label.

    Reference parity: queue/documentation_tool.py:297,317
    (``split('_')[-1]``).
    """
    return name.split("_")[-1]


def normalize_temporal(value: object) -> str:
    """Collapse missing temporal markers to the literal ``'na'``.

    Reference parity: queue/extract_check.py:87-89 ('None'/None/'na'/''
    all mean "no temporal dimension").
    """
    if value is None or value in ("None", "na", ""):
        return "na"
    return str(value)


def version_key(version: str) -> str:
    """Dots→underscores version token used in cache paths.

    Reference parity: queue/request_tools.py:339.
    """
    return version.replace(".", "_")
