"""Pipeline golden test: fixture request end-to-end through the engine
(SURVEY.md §5.2.2-3): plan expansion → cache → execute → merge →
bundle; second run does zero work; dry-run mutates nothing."""

import json
import os
import zipfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from det_module_spark.operators.merge import MergeItem
from det_module_spark.plans.runner import Engine, STATUS_DONE, STATUS_WAITING
from det_module_spark.sources.sinks import write_request_bundle

REQUEST = {
    "_id": "feedbeef00000000deadbeef",
    "custom_name": "golden pipeline request",
    "boundary": {"name": "nga_adm2_gadm28", "title": "Nigeria ADM2"},
    "release_data": [
        {"dataset": "aiddata_nga_v3", "filters": {"years": ["2002"]}},
        {"dataset": "worldbank_v1_4", "filters": {"donors": ["All"]}},
    ],
    "raster_data": [
        {
            "name": "udel_precip",
            "options": {"extract_types": ["mean", "categorical"]},
            "files": [{"name": "udel_precip_1998", "path": "/x.tif"}],
        }
    ],
}


@pytest.fixture()
def engine(spark, tmp_path):
    cells = spark.createDataFrame(
        [
            Row(asdf_id=i % 3, value=float(i), coverage=0.5,
                potential=float(i * 2), category="water" if i % 2 else "forest")
            for i in range(12)
        ]
    )
    locations = spark.createDataFrame(
        [
            Row(project_id="p1", lon=0.01, lat=0.01, total_commitments=100.0),
            Row(project_id="p1", lon=0.07, lat=0.01, total_commitments=100.0),
        ]
    )
    return Engine(
        spark,
        str(tmp_path / "cache"),
        cell_source=lambda item: cells,
        release_source=lambda item: locations,
        categories=["water", "forest"],
    )


def test_end_to_end_and_idempotency(engine, tmp_path):
    # dry run first: everything missing, nothing mutated
    dry = engine.run_request(REQUEST, dry_run=True)
    assert dry.status == STATUS_WAITING
    assert len(dry.items) == 6  # 2 msr + 2 release extracts + 1x1x2 raster
    assert len(dry.missing) == 6
    assert dry.merged is None

    # real run: all items execute, merge produced
    r1 = engine.run_request(REQUEST)
    assert r1.status == STATUS_DONE
    assert len(r1.missing) == 6
    merged = r1.merged
    # golden column set: release hash7 triple + worldbank sum +
    # raster mean + categorical expansion
    rel_hash7 = r1.items[0].spec_hash[:7]
    wb_hash7 = r1.items[2].spec_hash[:7]
    assert f"aiddata_nga_v3.{rel_hash7}.sum" in merged.columns
    assert f"aiddata_nga_v3.{rel_hash7}.potential" in merged.columns
    assert f"aiddata_nga_v3.{rel_hash7}.reliability" in merged.columns
    assert f"worldbank_v1_4.{wb_hash7}.sum" in merged.columns
    assert "udel_precip.1998.mean" in merged.columns
    assert "udel_precip.1998.categorical_water" in merged.columns
    assert "udel_precip.1998.categorical_forest" in merged.columns
    assert merged.columns[0] == "asdf_id"
    assert merged.count() == 3

    # second run: cache satisfies everything — zero work
    r2 = engine.run_request(REQUEST)
    assert r2.missing == []
    assert r2.status == STATUS_DONE

    # values survive the cache round-trip identically
    a = {r["asdf_id"]: r for r in r1.merged.collect()}
    b = {r["asdf_id"]: r for r in r2.merged.collect()}
    assert a == b


def test_bundle_sinks(engine, tmp_path):
    r = engine.run_request(REQUEST)
    merge_items = [
        MergeItem(engine.cache.get(i.spec_hash), i.dataset, i.temporal, i.extract_type)
        for i in r.items
        if i.kind == "extract"
    ]
    out = str(tmp_path / "bundle")
    artifacts = write_request_bundle(
        REQUEST, r.merged, merge_items, out,
        catalog={"udel_precip": {"title": "UDel precipitation"}},
    )
    # K1: single CSV, header row, '' for nulls
    with open(artifacts["csv"]) as f:
        header = f.readline().strip().split(",")
    assert header[0] == "asdf_id"
    assert any(c.endswith(".reliability") for c in header)
    # K2: json round-trips
    assert json.load(open(artifacts["json"]))["_id"] == REQUEST["_id"]
    # K3: documentation lists every result column
    doc = open(artifacts["doc"]).read()
    assert "udel_precip.1998.categorical_water" in doc
    assert "UDel precipitation" in doc
    # K4: zip contains the three artifacts
    names = zipfile.ZipFile(artifacts["zip"]).namelist()
    assert {"results.csv", "request_details.json", "documentation.txt"} <= set(names)


def test_msr_surface_cached_separately(engine):
    r = engine.run_request(REQUEST)
    msr_items = [i for i in r.items if i.kind == "msr"]
    for item in msr_items:
        surf = engine.cache.get(item.spec_hash)
        assert {"cell_x", "cell_y", "sum", "potential", "reliability"} <= set(
            surf.columns
        )
        row = surf.filter((F.col("cell_x") == 0) & (F.col("cell_y") == 0)).collect()[0]
        assert row["sum"] == 50.0  # 100 split over 2 locations
        assert row["potential"] == 100.0


def test_notification_hook_received_and_complete(spark, tmp_path):
    """K8 seam (queue/request_tools.py:254-326): the engine emits
    received/complete (and error) lifecycle events through a
    transport-free callback — the reference's email sink minus SMTP."""
    cells = spark.createDataFrame(
        [Row(asdf_id=i % 3, value=float(i), coverage=0.5,
             potential=float(i * 2), category="forest")
         for i in range(6)]
    )
    events = []
    eng = Engine(
        spark,
        str(tmp_path / "cache"),
        cell_source=lambda item: cells,
        categories=["forest"],
        notify=lambda event, payload: events.append((event, payload)),
    )
    req = {
        "_id": "notify01",
        "custom_name": "notify request",
        "boundary": {"name": "b"},
        "raster_data": [
            {
                "name": "cov",
                "options": {"extract_types": ["mean"]},
                "files": [{"name": "cov_1998", "path": "/x"}],
            }
        ],
    }
    r = eng.run_request(req)
    assert r.status == STATUS_DONE
    assert [e for e, _ in events] == ["received", "complete"]
    received, complete = events[0][1], events[1][1]
    assert received["request_id"] == "notify01"
    assert received["title"] == "notify request"
    assert received["n_items"] == 1
    assert complete == {
        "request_id": "notify01", "n_items": 1,
        "n_executed": 1, "n_cached": 0,
    }
    # cached re-run still notifies, with zero executed
    events.clear()
    eng.run_request(req)
    assert [e for e, _ in events] == ["received", "complete"]
    assert events[1][1]["n_executed"] == 0
    assert events[1][1]["n_cached"] == 1
    # dry run announces receipt but never completes
    events.clear()
    eng.run_request(req, dry_run=True)
    assert [e for e, _ in events] == ["received"]
    assert events[0][1]["dry_run"] is True


def test_notification_hook_error(spark, tmp_path):
    def boom(item):
        raise RuntimeError("source unavailable")

    events = []
    eng = Engine(
        spark,
        str(tmp_path / "cache"),
        cell_source=boom,
        notify=lambda event, payload: events.append((event, payload)),
    )
    req = {
        "_id": "notify02",
        "boundary": {"name": "b"},
        "raster_data": [
            {
                "name": "cov",
                "options": {"extract_types": ["mean"]},
                "files": [{"name": "cov_1998", "path": "/x"}],
            }
        ],
    }
    r = eng.run_request(req)
    assert r.status == -2
    assert [e for e, _ in events] == ["received", "error"]
    assert "source unavailable" in events[1][1]["error"]
