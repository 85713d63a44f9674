"""Full per-request documentation builder (SURVEY.md K3).

Section-by-section parity with the reference's DocBuilder
(queue/documentation_tool.py:67-97 build order, 103-167 header/info/
timeline, 172-199 template text, 203-339 request overview, 344-512
metadata, 519-524 license):

    header -> info -> timeline -> general templates -> overview
    -> meta -> additional (license)

The document is built as a *structured section model* (title +
paragraph/table blocks) so the text renderer, the PDF renderer and the
golden tests all walk the same data. The text report is always
written; the PDF renders via reportlab when importable and otherwise
via the bundled minimal PDF 1.4 writer (sources/pdfwriter.py), so the
render path always executes — the text path is the contract, the PDF
path is a format.

Differences from the reference, by design:

- dataset metadata comes from a caller-supplied ``catalog`` dict
  (name -> meta document) instead of a live Mongo collection;
- timestamps render in UTC (the reference used server-localtime,
  documentation_tool.py:64) so output is machine-independent;
- the logo image is skipped (binary asset, no engine semantics).
"""

from __future__ import annotations

import os
import time
from typing import Any

# one block is ("p", text) or ("table", [[key, value], ...])
Block = tuple[str, Any]
Section = dict[str, Any]  # {"title": str, "blocks": [Block, ...]}

_TEMPLATE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "templates")

# reliability extract column triple (documentation_tool.py:253-257)
RELIABILITY_TRIPLE = ["sum", "potential", "reliability"]


def time_str(timestamp: int | str | None = None, now: int | None = None) -> str:
    """Reference time_str (documentation_tool.py:55-64): 0 or
    unparseable -> '---'; None -> current time. UTC for determinism."""
    if timestamp is not None:
        try:
            timestamp = int(timestamp)
            if timestamp == 0:
                return "---"
        except (TypeError, ValueError):
            return "---"
    else:
        timestamp = now if now is not None else int(time.time())
    return time.strftime("%Y-%m-%d %H:%M:%S (UTC)", time.gmtime(timestamp))


def enforce_max_word_length(string: str, max_chars: int = 80) -> str:
    """F13 — break unbroken >80-char tokens with newlines
    (documentation_tool.py:393-406)."""
    out = []
    for word in string.split(" "):
        if len(word) > max_chars:
            word = "\n".join(
                word[i : i + max_chars] for i in range(0, len(word), max_chars)
            )
        out.append(word)
    return " ".join(out)


def _template(name: str) -> list[str]:
    """Template text source (SURVEY.md S11): one paragraph per line."""
    path = os.path.join(_TEMPLATE_DIR, name)
    with open(path) as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


class DocBuilder:
    """Build request documentation from a request dict + catalog.

    ``catalog`` maps dataset name -> metadata document (the reference
    looked these up in the ``asdf.data`` Mongo collection,
    documentation_tool.py:344-347).
    """

    def __init__(
        self,
        request: dict[str, Any],
        catalog: dict[str, dict] | None = None,
        download_server: str = "download.localhost",
        now: int | None = None,
    ):
        self.request = request
        self.catalog = catalog or {}
        self.download_server = download_server
        self.now = now

    # ---------------------------------------------------------- sections

    def build_sections(self) -> list[Section]:
        """build_doc order: documentation_tool.py:74-95."""
        return [
            self.header_section(),
            self.info_section(),
            self.timeline_section(),
            *self.general_sections(),
            self.overview_section(),
            self.meta_section(),
            self.additional_section(),
        ]

    def header_section(self) -> Section:
        # documentation_tool.py:103-115 (logo image skipped)
        return {
            "title": "header",
            "blocks": [("p", "geo(query) Request Documentation")],
        }

    def info_section(self) -> Section:
        # documentation_tool.py:119-141
        r = self.request
        rid = str(r.get("_id", ""))
        rows = [
            ["Request Name", str(r.get("custom_name", ""))],
            ["Request Id", rid],
            ["Email", str(r.get("email", ""))],
            ["Generated on", time_str(None, self.now)],
            [
                "Download Link",
                f"http://{self.download_server}/query/#!/status/{rid}",
            ],
        ]
        return {"title": "Report Info", "blocks": [("table", rows)]}

    def timeline_section(self) -> Section:
        # documentation_tool.py:145-167: first three stages from the
        # request, the final (complete) row stamped at build time
        stages = self.request.get("stage", [])
        rows = []
        for i, st in enumerate(stages):
            if i == len(stages) - 1:
                rows.append([str(st.get("name", "")), time_str(None, self.now)])
            else:
                rows.append([str(st.get("name", "")), time_str(st.get("time"))])
        return {"title": "Processing Timeline", "blocks": [("table", rows)]}

    def general_sections(self) -> list[Section]:
        # documentation_tool.py:172-199 — four template text pages
        return [
            {"title": "general", "blocks": [("p", ln) for ln in _template("general.txt")]},
            {"title": "field_names", "blocks": [("p", ln) for ln in _template("field_names.txt")]},
            {"title": "notes", "blocks": [("p", ln) for ln in _template("notes.txt")]},
            {"title": "aid_data", "blocks": [("p", ln) for ln in _template("aid_data.txt")]},
        ]

    def overview_section(self) -> Section:
        # documentation_tool.py:203-339
        from det_module_spark.plans.spec import msr_hash

        blocks: list[Block] = [
            (
                "p",
                'Note: This section only contains an overview of boundary and '
                'data selections. For meta data, see the "Meta Information" '
                "section.",
            )
        ]

        boundary = self.request.get("boundary", {})
        blocks.append(("p", "Boundary Selection"))
        blocks.append(
            (
                "table",
                [
                    ["Title", str(boundary.get("title", ""))],
                    ["Dataset", str(boundary.get("name", ""))],
                    ["Group", str(boundary.get("group", ""))],
                    ["Description", str(boundary.get("description", ""))],
                ],
            )
        )

        selection_count = 0

        # release selections: the sum/potential/reliability column
        # triple, worldbank special-cased to plain sum
        # (documentation_tool.py:245-284)
        for dset in self.request.get("release_data", []):
            selection_count += 1
            name = dset["dataset"]
            h = dset.get("hash") or msr_hash(name, dset.get("filters"))
            methods = (
                ["sum"] if name.startswith("worldbank") else RELIABILITY_TRIPLE
            )
            colnames = ", ".join(f"{name}.{h[0:7]}.{m}" for m in methods)
            rows = [
                ["Column Names", colnames],
                ["Dataset", name],
                ["Filters", f"hash: {h}"],
            ]
            for fk in dset.get("filters", {}):
                rows.append(
                    [str(fk), ", ".join(str(i) for i in dset["filters"][fk])]
                )
            blocks.append(
                ("p", f"Data Selection {selection_count} - {dset.get('custom_name', '')}")
            )
            blocks.append(("table", rows))

        # raster selections: files x extract_types column cross-product
        # (documentation_tool.py:287-339, F15)
        for dset in self.request.get("raster_data", []):
            selection_count += 1
            name = dset["name"]
            temporal_raw = [
                f["name"].split("_")[-1] for f in dset.get("files", [])
            ]
            extract_types = dset.get("options", {}).get("extract_types", [])
            n_cols = len(temporal_raw) * len(extract_types)
            colnames = (
                f'Format: "{name}.<temporal>.<method>" for all combinations '
                "of <temporal> and <method> which can be found in the "
                '"Temporal Selection" and "Extract Types Selected" fields '
                f"below ({n_cols} columns total)"
            )
            # O2 temporal int-sort desc unless non-numeric 'none' marker
            # (documentation_tool.py:319-326). Any OTHER non-integer
            # token ('2012.tif', '201201-v2') keeps the raw order too —
            # int() raising out of the doc builder would kill the whole
            # bundle write after the CSV already landed.
            def _as_int(s):
                try:
                    return int(s)
                except (TypeError, ValueError):
                    return None

            ints = [_as_int(s) for s in temporal_raw]
            if "none" in temporal_raw or any(v is None for v in ints):
                temporal_str = [str(s) for s in temporal_raw]
            else:
                temporal_str = [
                    str(ts) for ts in sorted(ints, reverse=True)
                ]
            rows = [
                ["Column Names", colnames],
                ["Dataset", name],
                ["Temporal Type", str(dset.get("temporal_type", ""))],
                ["Temporal Selection", ", ".join(temporal_str)],
                ["Extract Types Selected", ", ".join(extract_types)],
            ]
            blocks.append(
                ("p", f"Data Selection {selection_count} - {dset.get('custom_name', '')}")
            )
            blocks.append(("table", rows))

        return {"title": "Request Overview", "blocks": blocks}

    def build_meta(self, name: str, item_type: str) -> list[list[str]]:
        """Per-dataset metadata table (documentation_tool.py:344-437)."""
        meta = self.catalog.get(name)
        if meta is None:
            raise KeyError(
                f"Could not lookup dataset ({name}, {item_type}) for build_meta"
            )

        details = meta.get("details", "(no additional details)")
        data = [
            ["Title", str(meta.get("title", ""))],
            ["Name", str(meta.get("name", ""))],
            ["Version", str(meta.get("version", ""))],
            ["Description", str(meta.get("description", ""))],
            ["Details", str(details)],
            ["Type", str(meta.get("type", ""))],
            ["File Format", str(meta.get("file_format", ""))],
            ["File Extension", str(meta.get("file_extension", ""))],
            ["Scale", str(meta.get("scale", ""))],
            ["Temporal", ""],
        ]

        temporal = meta.get("temporal", {})
        data.append(["Temporal Type", str(temporal.get("name", ""))])
        if temporal.get("format") not in (None, "None"):
            data.append(["Temporal Name", str(temporal.get("name", ""))])
            data.append(["Temporal Format", str(temporal.get("format", ""))])
            data.append(["Temporal Start", str(temporal.get("start", ""))])
            data.append(["Temporal End", str(temporal.get("end", ""))])

        data.append(
            ["Bounding Box", str(meta.get("spatial", {}).get("coordinates", ""))]
        )
        asdf = meta.get("asdf", {})
        data.append(["Date Added", str(asdf.get("date_added", ""))])
        data.append(["Date Updated", str(asdf.get("date_updated", ""))])

        extras = meta.get("extras", {})
        if "sources_name" in extras:
            data.append(["Source Name", str(extras["sources_name"])])
        if "sources_web" in extras:
            data.append(
                ["Source Link", enforce_max_word_length(str(extras["sources_web"]))]
            )
        if "citation" in extras:
            data.append(
                ["Citation", enforce_max_word_length(str(extras["citation"]))]
            )

        options = meta.get("options", {})
        if item_type == "boundary":
            data.append(["Group", str(options.get("group", ""))])
            data.append(["Group Class", str(options.get("group_class", ""))])
            data.append(["Group Title", str(options.get("group_title", ""))])
        elif item_type == "raster":
            data.append(
                ["Variable Description", str(options.get("variable_description", ""))]
            )
            data.append(["Resolution", str(options.get("resolution", ""))])
            data.append(
                ["Extract Types", ", ".join(options.get("extract_types", []))]
            )
            data.append(["Factor", str(options.get("factor", ""))])
        elif item_type == "release":
            data.append(["Download Link", "(see request download link)"])

        return data

    def meta_section(self) -> Section:
        # documentation_tool.py:440-512 — boundary meta, then each
        # dataset once (dedup by name)
        blocks: list[Block] = []
        boundary_name = self.request.get("boundary", {}).get("name", "")
        if boundary_name and boundary_name in self.catalog:
            blocks.append(("p", "Boundary"))
            blocks.append(("table", self.build_meta(boundary_name, "boundary")))

        meta_log: list[str] = []
        for dset in self.request.get("release_data", []):
            if dset["dataset"] not in meta_log and dset["dataset"] in self.catalog:
                meta_log.append(dset["dataset"])
                blocks.append(("p", f"Dataset {len(meta_log)}"))
                blocks.append(("table", self.build_meta(dset["dataset"], "release")))
        for dset in self.request.get("raster_data", []):
            if dset["name"] not in meta_log and dset["name"] in self.catalog:
                meta_log.append(dset["name"])
                blocks.append(("p", f"Dataset {len(meta_log)}"))
                blocks.append(
                    ("table", self.build_meta(dset["name"], dset.get("type", "raster")))
                )
        return {"title": "Meta Information", "blocks": blocks}

    def additional_section(self) -> Section:
        # documentation_tool.py:519-524
        return {
            "title": "additional",
            "blocks": [("p", ln) for ln in _template("additional.txt")],
        }

    # --------------------------------------------------------- renderers

    def to_text(self) -> str:
        # one rendering path: section_lines is the single source of
        # truth for per-section text, shared with the minimal-PDF
        # renderer — a formatting tweak applied to one copy can no
        # longer desynchronize the text report from the PDF
        lines: list[str] = []
        for sec in self.build_sections():
            lines.append("")
            lines.extend(self.section_lines(sec))
            lines.append("")
        return "\n".join(lines).lstrip("\n") + "\n"

    def section_lines(self, sec: Section) -> list[str]:
        """One section as plain text lines — THE shared renderer for
        to_text and the minimal-PDF path."""
        lines = [str(sec["title"]), "=" * max(4, len(str(sec["title"])))]
        for kind, payload in sec["blocks"]:
            if kind == "p":
                lines.append(str(payload))
            else:
                width = max((len(r[0]) for r in payload), default=0)
                for rk, rv in payload:
                    lines.append(f"  {rk.ljust(width)} | {rv}")
        return lines

    def to_pdf(self, path: str) -> str:
        """PDF rendering (documentation_tool.py:74,530-531): reportlab
        when importable (richer layout), else the bundled pure-Python
        PDF 1.4 writer (sources/pdfwriter.py) — the render path always
        executes; only the layout engine is environment-dependent."""
        try:
            return self._to_pdf_reportlab(path)
        except ImportError:
            return self._to_pdf_minimal(path)

    def _to_pdf_minimal(self, path: str) -> str:
        from det_module_spark.sources.pdfwriter import paginate, write_pdf

        pages: list[list[str]] = []
        for sec in self.build_sections():
            pages.extend(paginate(self.section_lines(sec)))
        return write_pdf(path, pages)

    def _to_pdf_reportlab(self, path: str) -> str:
        from reportlab.lib.pagesizes import letter  # noqa: F401
        from reportlab.lib.units import inch
        from reportlab.platypus import (
            PageBreak,
            Paragraph,
            SimpleDocTemplate,
            Spacer,
            Table,
        )
        from reportlab.lib.styles import getSampleStyleSheet

        styles = getSampleStyleSheet()
        story = []
        for sec in self.build_sections():
            story.append(Paragraph(str(sec["title"]), styles["Heading2"]))
            story.append(Spacer(1, 0.1 * inch))
            for kind, payload in sec["blocks"]:
                if kind == "p":
                    story.append(Paragraph(str(payload), styles["BodyText"]))
                else:
                    story.append(
                        Table([[str(k), Paragraph(str(v), styles["Normal"])] for k, v in payload])
                    )
                story.append(Spacer(1, 0.1 * inch))
            story.append(PageBreak())
        SimpleDocTemplate(path, pagesize=letter).build(story)
        return path
