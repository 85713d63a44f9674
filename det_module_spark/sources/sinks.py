"""Request-output sinks (SURVEY.md K1-K4, K9).

The reference ships each completed request as a bundle: merged wide
CSV + request JSON dump + PDF documentation + source artifacts, zipped
(queue/request_tools.py:516-613). Re-founded:

- merged CSV: single-file contract (K1, request_tools.py:698-703);
- request JSON: ``indent=4`` dump (K2, request_tools.py:553-558);
- documentation: the PDF builder (K3, documentation_tool.py) needs
  reportlab — not bundled — so the same content renders as a
  deterministic text report, with the PDF path gated behind an
  import-try;
- zip packaging (K4, request_tools.py:602-606).

All driver-side: the bundle is one row per boundary feature — tiny by
construction regardless of input scale.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame

from det_module_spark.operators.merge import MergeItem, renamed_exfields


def write_merged_csv(merged: DataFrame, out_dir: str, name: str = "results.csv") -> str:
    """K1 — single CSV with header; exact-'' NA semantics on the way
    out (nulls write as empty string)."""
    tmp = os.path.join(out_dir, "_csv_tmp")
    (
        merged.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .csv(tmp)
    )
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".csv")
    )
    final = os.path.join(out_dir, name)
    shutil.move(os.path.join(tmp, part), final)
    shutil.rmtree(tmp)
    return final


def write_request_json(request: dict[str, Any], out_dir: str) -> str:
    """K2 — request_details.json, indent=4 (request_tools.py:553-558)."""
    path = os.path.join(out_dir, "request_details.json")
    with open(path, "w") as f:
        json.dump(request, f, indent=4, sort_keys=True)
    return path


def build_documentation(
    request: dict[str, Any],
    merge_items: list[MergeItem],
    out_dir: str,
    catalog: dict[str, dict] | None = None,
    now: int | None = None,
) -> str:
    """K3 — per-request documentation via the full DocBuilder
    (sources/docbuilder.py; reference parity
    queue/documentation_tool.py:67-97), plus the concrete result-column
    dictionary produced by the naming algebra for this run's merge
    items.

    The text report is ALWAYS written (it is the contract); a PDF is
    always written alongside it — rendered by reportlab when
    importable, else by the bundled minimal PDF writer."""
    import textwrap

    from det_module_spark.sources.docbuilder import DocBuilder

    builder = DocBuilder(request, catalog=catalog, now=now)
    lines = [builder.to_text()]

    def wrap(text: str) -> list[str]:
        # 80-char wrap incl. breaking long unbroken tokens (reference
        # parity: queue/documentation_tool.py:393-406 word-wrap)
        return textwrap.wrap(
            text, width=80, break_long_words=True, break_on_hyphens=False
        ) or [""]

    lines.append("RESULT COLUMNS  (<dataset>.<filter>.<method>)")
    lines.append("-" * 38)
    lines.append("asdf_id: unique feature id within the boundary dataset")
    for mi in merge_items:
        for _, out_name in renamed_exfields(mi):
            lines.extend(
                wrap(f"{out_name}: {mi.extract_type} extract of {mi.dataset}")
            )
    if catalog:
        lines.append("")
        lines.append("DATASET METADATA")
        lines.append("-" * 38)
        seen = set()
        for mi in merge_items:
            if mi.dataset in seen:  # dedup by name (documentation_tool.py:466-472)
                continue
            seen.add(mi.dataset)
            meta = catalog.get(mi.dataset, {})
            lines.append(f"{mi.dataset}: {meta.get('title', 'n/a')}")

    path = os.path.join(out_dir, "documentation.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    # PDF always renders now: reportlab when importable, else the
    # bundled minimal PDF 1.4 writer (sources/pdfwriter.py)
    builder.to_pdf(os.path.join(out_dir, "documentation.pdf"))
    return path


def package_bundle(out_dir: str) -> str:
    """K4 — zip the bundle directory (request_tools.py:602-606)."""
    return shutil.make_archive(out_dir, "zip", out_dir)


def write_request_bundle(
    request: dict[str, Any],
    merged: DataFrame,
    merge_items: list[MergeItem],
    out_dir: str,
    catalog: dict[str, dict] | None = None,
) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    artifacts = {
        "csv": write_merged_csv(merged, out_dir),
        "json": write_request_json(request, out_dir),
        "doc": build_documentation(request, merge_items, out_dir, catalog),
    }
    artifacts["zip"] = package_bundle(out_dir)
    return artifacts
