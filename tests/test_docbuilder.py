"""DocBuilder golden tests (SURVEY.md K3).

Section-by-section parity with the reference DocBuilder
(queue/documentation_tool.py:67-97) on the doc_test.py:12-96 fixture
request shape: header, info, timeline, template pages, overview with
the sum/potential/reliability column triple + worldbank special case +
raster files x extract-types cross-product, metadata with dedup-by-name
and the 80-char word-wrap, license page.
"""

import pytest

from det_module_spark.sources.docbuilder import (
    DocBuilder,
    enforce_max_word_length,
    time_str,
)

# shape mirrors the reference fixture (queue/doc_test.py:12-96)
REQUEST = {
    "_id": "57a2ff1bc15e002f448b4568",
    "boundary": {
        "title": "Nigeria ADM0 Boundary",
        "group": "nga_gadm28",
        "name": "nga_adm0_gadm28",
        "description": "Boundary file for ADM0 in Nigeria.",
    },
    "release_data": [
        {
            "dataset": "nigeriaaims_level1_v1_3",
            "custom_name": "New Request",
            "filters": {"donors": ["AFDB"], "ad_sector_names": ["All"]},
            "hash": "abcdef0123456789abcdef0123456789abcdef01",
        },
        {
            "dataset": "worldbank_v1_4",
            "custom_name": "wb selection",
            "filters": {"donors": ["All"]},
            "hash": "1234567aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        },
    ],
    "raster_data": [
        {
            "name": "udel_precip_v401_min",
            "title": "UDel Precipitation Yearly (min)",
            "type": "raster",
            "custom_name": "fo",
            "temporal_type": "year",
            "options": {"extract_types": ["mean", "max"]},
            "files": [
                {"name": "udel_precip_v401_min_1998", "path": "precip_1998_min.tif"},
                {"name": "udel_precip_v401_min_2001", "path": "precip_2001_min.tif"},
                {"name": "udel_precip_v401_min_1999", "path": "precip_1999_min.tif"},
            ],
        }
    ],
    "email": "user@example.com",
    "custom_name": "My full test request",
    "status": 1,
    "priority": 0,
    "stage": [
        {"name": "submit", "time": 1470299931},
        {"name": "prep", "time": 1470419931},
        {"name": "process", "time": 1470419931},
        {"name": "complete", "time": 0},
    ],
}

CATALOG = {
    "nga_adm0_gadm28": {
        "title": "Nigeria ADM0 Boundary",
        "name": "nga_adm0_gadm28",
        "version": 2.8,
        "description": "Boundary file.",
        "type": "boundary",
        "file_format": "vector",
        "file_extension": "geojson",
        "scale": "adm0",
        "temporal": {"name": "None", "format": "None"},
        "spatial": {"coordinates": [[1, 2], [3, 4]]},
        "asdf": {"date_added": "2016-01-01", "date_updated": "2016-06-01"},
        "extras": {
            "sources_name": "GADM",
            "sources_web": "http://example.com/" + "x" * 100,
            "citation": "someone et al",
        },
        "options": {
            "group": "nga_gadm28",
            "group_class": "actual",
            "group_title": "Nigeria GADM 2.8",
        },
    },
    "udel_precip_v401_min": {
        "title": "UDel Precipitation Yearly (min)",
        "name": "udel_precip_v401_min",
        "version": 4.01,
        "description": "precip",
        "type": "raster",
        "file_format": "raster",
        "file_extension": "tif",
        "scale": "global",
        "temporal": {"name": "year", "format": "%Y", "start": 1900, "end": 2014},
        "spatial": {"coordinates": [[-180, -90], [180, 90]]},
        "asdf": {"date_added": "2016-01-01", "date_updated": "2016-06-01"},
        "extras": {},
        "options": {
            "variable_description": "precipitation",
            "resolution": 0.5,
            "extract_types": ["mean", "max", "min"],
            "factor": 1,
        },
    },
}

NOW = 1470500000


@pytest.fixture()
def sections():
    b = DocBuilder(REQUEST, catalog=CATALOG, download_server="dl.example", now=NOW)
    return {s["title"]: s for s in b.build_sections()}


def table(sec, idx=0):
    tables = [p for k, p in sec["blocks"] if k == "table"]
    return tables[idx]


def test_time_str_contract():
    # documentation_tool.py:55-64: 0 and garbage -> '---'
    assert time_str(0) == "---"
    assert time_str("not a number") == "---"
    assert time_str(1470299931) == "2016-08-04 08:38:51 (UTC)"
    assert time_str(None, now=NOW) == time_str(NOW)


def test_word_wrap_80():
    s = "short " + "y" * 200
    fixed = enforce_max_word_length(s)
    assert all(len(piece) <= 80 for piece in fixed.replace(" ", "\n").split("\n"))
    assert fixed.startswith("short ")


def test_section_order_matches_reference(sections):
    # build_doc call order, documentation_tool.py:74-95
    assert list(sections) == [
        "header", "Report Info", "Processing Timeline",
        "general", "field_names", "notes", "aid_data",
        "Request Overview", "Meta Information", "additional",
    ]


def test_info_section(sections):
    rows = dict(table(sections["Report Info"]))
    assert rows["Request Name"] == "My full test request"
    assert rows["Request Id"] == REQUEST["_id"]
    assert rows["Email"] == "user@example.com"
    assert REQUEST["_id"] in rows["Download Link"]
    assert "dl.example" in rows["Download Link"]


def test_timeline_section(sections):
    rows = table(sections["Processing Timeline"])
    assert [r[0] for r in rows] == ["submit", "prep", "process", "complete"]
    assert rows[0][1] == time_str(1470299931)
    # final stage stamped at build time, not from the request
    # (documentation_tool.py:155)
    assert rows[3][1] == time_str(NOW)


def test_overview_release_triple_and_worldbank(sections):
    blocks = sections["Request Overview"]["blocks"]
    tables = [p for k, p in blocks if k == "table"]
    # boundary table first
    assert dict(tables[0])["Dataset"] == "nga_adm0_gadm28"

    # selection 1: full reliability triple with hash7 middle
    sel1 = dict(tables[1])
    assert sel1["Column Names"] == (
        "nigeriaaims_level1_v1_3.abcdef0.sum, "
        "nigeriaaims_level1_v1_3.abcdef0.potential, "
        "nigeriaaims_level1_v1_3.abcdef0.reliability"
    )
    assert sel1["Filters"] == "hash: " + REQUEST["release_data"][0]["hash"]
    assert sel1["donors"] == "AFDB"
    assert sel1["ad_sector_names"] == "All"

    # selection 2: worldbank -> sum only (documentation_tool.py:258-261)
    sel2 = dict(tables[2])
    assert sel2["Column Names"] == "worldbank_v1_4.1234567.sum"


def test_overview_raster_cross_product_and_temporal_sort(sections):
    blocks = sections["Request Overview"]["blocks"]
    tables = [p for k, p in blocks if k == "table"]
    raster = dict(tables[3])
    # 3 files x 2 extract types = 6 columns (documentation_tool.py:295-307)
    assert "(6 columns total)" in raster["Column Names"]
    # int-sorted descending (documentation_tool.py:319-326)
    assert raster["Temporal Selection"] == "2001, 1999, 1998"
    assert raster["Extract Types Selected"] == "mean, max"


def test_meta_section_fields_and_wrap(sections):
    blocks = sections["Meta Information"]["blocks"]
    tables = [p for k, p in blocks if k == "table"]
    boundary_meta = dict(tables[0])
    # boundary-specific rows (documentation_tool.py:420-423)
    assert boundary_meta["Group"] == "nga_gadm28"
    assert boundary_meta["Group Class"] == "actual"
    # >80-char source link word-wrapped (documentation_tool.py:409-412)
    assert "\n" in boundary_meta["Source Link"]

    raster_meta = dict(tables[-1])
    # raster-specific rows (documentation_tool.py:425-429)
    assert raster_meta["Variable Description"] == "precipitation"
    assert raster_meta["Resolution"] == "0.5"
    assert raster_meta["Extract Types"] == "mean, max, min"
    assert raster_meta["Factor"] == "1"
    # temporal block expands when format != None
    # (documentation_tool.py:373-379)
    assert raster_meta["Temporal Format"] == "%Y"
    assert raster_meta["Temporal Start"] == "1900"


def test_meta_dedup_by_name():
    req = dict(REQUEST)
    req["release_data"] = []
    req["raster_data"] = REQUEST["raster_data"] * 3  # same dataset thrice
    b = DocBuilder(req, catalog=CATALOG, now=NOW)
    sec = {s["title"]: s for s in b.build_sections()}["Meta Information"]
    labels = [p for k, p in sec["blocks"] if k == "p"]
    # boundary + exactly ONE dataset entry (documentation_tool.py:492-495)
    assert labels == ["Boundary", "Dataset 1"]


def test_release_hash_computed_when_absent():
    req = {
        "_id": "x",
        "boundary": {"name": "b"},
        "release_data": [
            {"dataset": "aiddata_x", "custom_name": "n",
             "filters": {"donors": ["AFDB"]}}  # no 'hash' key
        ],
        "stage": [],
    }
    from det_module_spark.plans.spec import msr_hash

    b = DocBuilder(req, now=NOW)
    sec = [s for s in b.build_sections() if s["title"] == "Request Overview"][0]
    sel = dict([p for k, p in sec["blocks"] if k == "table"][1])
    h = msr_hash("aiddata_x", {"donors": ["AFDB"]})
    assert f"aiddata_x.{h[:7]}.sum" in sel["Column Names"]


def test_text_render_deterministic_and_complete(sections):
    b = DocBuilder(REQUEST, catalog=CATALOG, download_server="dl.example", now=NOW)
    t1, t2 = b.to_text(), b.to_text()
    assert t1 == t2
    for expected in [
        "Report Info", "Processing Timeline", "Request Overview",
        "Meta Information", "TERMS OF USE", "INTERPRETING CSV COLUMN NAMES",
        "nigeriaaims_level1_v1_3.abcdef0.reliability",
    ]:
        assert expected in t1


def test_pdf_always_renders(tmp_path):
    """K3 (VERDICT r02 #4): the PDF render path executes regardless of
    reportlab — the minimal PDF 1.4 writer is the fallback."""
    b = DocBuilder(REQUEST, catalog=CATALOG, now=NOW)
    out = b.to_pdf(str(tmp_path / "doc.pdf"))
    assert out.endswith(".pdf")
    head = open(out, "rb").read(8)
    assert head.startswith(b"%PDF-1.")


def _pdf_unescape(raw: bytes) -> str:
    out, i = [], 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\":
            i += 1
            c = raw[i : i + 1]
        out.append(c)
        i += 1
    return b"".join(out).decode("latin-1")


def test_minimal_pdf_structure_and_text(tmp_path):
    """Byte-parse the fallback writer's output: header, xref offsets
    landing on 'N 0 obj', trailer /Root, page count consistency, and
    section-text extraction from the uncompressed content streams."""
    import re

    b = DocBuilder(REQUEST, catalog=CATALOG, now=NOW)
    path = str(tmp_path / "doc.pdf")
    b._to_pdf_minimal(path)
    buf = open(path, "rb").read()
    assert buf.startswith(b"%PDF-1.4\n")
    assert buf.rstrip().endswith(b"%%EOF")

    # trailer: startxref points at the xref table
    m = re.search(rb"startxref\n(\d+)\n%%EOF", buf)
    assert m
    xref_off = int(m.group(1))
    assert buf[xref_off : xref_off + 4] == b"xref"

    # every xref entry lands exactly on its object header
    entries = re.findall(rb"(\d{10}) 00000 n ", buf[xref_off:])
    assert entries
    for num, off in enumerate(entries, start=1):
        at = int(off)
        assert buf[at:].startswith(b"%d 0 obj" % num), num

    # /Count in the Pages object matches the number of Page objects
    count = int(re.search(rb"/Count (\d+)", buf).group(1))
    assert count == len(re.findall(rb"/Type /Page\b[^s]", buf))
    assert len(entries) == 3 + 2 * count

    # text extraction: every section title appears in a content stream
    streams = re.findall(rb"stream\n(.*?)\nendstream", buf, re.S)
    text = "\n".join(
        _pdf_unescape(s)
        for blob in streams
        for s in re.findall(rb"\((.*?[^\\])?\) Tj", blob)
        if s
    )
    for title in [
        "Report Info",
        "Processing Timeline",
        "Request Overview",
        "Meta Information",
    ]:
        assert title in text
    assert REQUEST["_id"] in text  # table rows render too


def test_minimal_pdf_wrap_and_escape(tmp_path):
    """Writer primitives: parens/backslash escape round-trips, long
    unbroken tokens hard-wrap, pagination splits at the page size."""
    from det_module_spark.sources.pdfwriter import (
        LINES_PER_PAGE,
        paginate,
        write_pdf,
    )

    pages = paginate(["x" * 300, "(a) \\ (b)"] + ["line"] * 60)
    assert all(len(p) <= LINES_PER_PAGE for p in pages)
    assert len(pages) >= 2
    path = str(tmp_path / "w.pdf")
    write_pdf(path, pages)
    buf = open(path, "rb").read()
    assert rb"(\(a\) \\ \(b\)) Tj" in buf
