"""Wide-merge + naming algebra golden tests (SURVEY.md hard list (d))."""

import pytest
from pyspark.sql import Row

from det_module_spark.operators.merge import MergeItem, merge_extracts, renamed_exfields


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [
            Row(asdf_id=1, exfield_0=1.5, NAME_0="Nigeria", NAME_1="Kano"),
            Row(asdf_id=2, exfield_0=2.5, NAME_0="Nigeria", NAME_1="Lagos"),
        ]
    )
    rel = spark.createDataFrame(
        [
            Row(asdf_id=1, exfield_sum=10.0, exfield_potential=20.0,
                exfield_reliability=0.5),
            Row(asdf_id=2, exfield_sum=4.0, exfield_potential=8.0,
                exfield_reliability=0.5),
        ]
    )
    cat = spark.createDataFrame(
        [
            Row(asdf_id=1, exfield_water=3, exfield_forest=1),
            Row(asdf_id=2, exfield_water=0, exfield_forest=2),
        ]
    )
    wb = spark.createDataFrame(
        [Row(asdf_id=1, exfield_sum=7.0), Row(asdf_id=2, exfield_sum=9.0)]
    )
    return base, rel, cat, wb


def test_rename_identity_case(frames):
    base, _, _, _ = frames
    item = MergeItem(base, "udel_precip_v401_sum", "1998", "mean")
    assert renamed_exfields(item) == [
        ("exfield_0", "udel_precip_v401_sum.1998.mean")
    ]


def test_rename_categorical_case(frames):
    # request_tools.py:670-673: append _<category> to the file stem
    _, _, cat, _ = frames
    item = MergeItem(cat, "landcover", "2000", "categorical")
    assert renamed_exfields(item) == [
        ("exfield_water", "landcover.2000.categorical_water"),
        ("exfield_forest", "landcover.2000.categorical_forest"),
    ]


def test_rename_reliability_case(frames):
    # request_tools.py:675-681: <dataset>.<hash7>.<method>
    _, rel, _, _ = frames
    h = "0123456789abcdef"
    item = MergeItem(rel, "aiddata_v3", h, "reliability")
    assert renamed_exfields(item) == [
        ("exfield_sum", "aiddata_v3.0123456.sum"),
        ("exfield_potential", "aiddata_v3.0123456.potential"),
        ("exfield_reliability", "aiddata_v3.0123456.reliability"),
    ]


def test_rename_worldbank_case(frames):
    # worldbank_* datasets take the hash7 path even for 'sum'
    _, _, _, wb = frames
    item = MergeItem(wb, "worldbank_v1_4_1", "fedcba9876543210", "sum")
    assert renamed_exfields(item) == [
        ("exfield_sum", "worldbank_v1_4_1.fedcba9.sum")
    ]


def test_merge_column_order_and_values(frames):
    base, rel, cat, wb = frames
    merged = merge_extracts(
        [
            MergeItem(base, "udel_precip_v401_sum", "1998", "mean"),
            MergeItem(rel, "aiddata_v3", "0123456789abcdef", "reliability"),
            MergeItem(cat, "landcover", "2000", "categorical"),
            MergeItem(wb, "worldbank_v1_4_1", "fedcba9876543210", "sum"),
        ]
    )
    # order: asdf_id, extract cols in merge order, then passthrough attrs
    # (request_tools.py:630, 690-695)
    assert merged.columns == [
        "asdf_id",
        "udel_precip_v401_sum.1998.mean",
        "aiddata_v3.0123456.sum",
        "aiddata_v3.0123456.potential",
        "aiddata_v3.0123456.reliability",
        "landcover.2000.categorical_water",
        "landcover.2000.categorical_forest",
        "worldbank_v1_4_1.fedcba9.sum",
        "NAME_0",
        "NAME_1",
    ]
    rows = {r["asdf_id"]: r for r in merged.collect()}
    assert rows[1]["udel_precip_v401_sum.1998.mean"] == 1.5
    assert rows[1]["aiddata_v3.0123456.reliability"] == 0.5
    assert rows[2]["landcover.2000.categorical_forest"] == 2
    assert rows[2]["NAME_1"] == "Lagos"


def test_merge_is_order_insensitive_on_key(spark):
    # property (SURVEY.md §5.2): join alignment, not positional
    a = spark.createDataFrame([Row(asdf_id=i, exfield_0=float(i)) for i in (1, 2, 3)])
    b = spark.createDataFrame(
        [Row(asdf_id=i, exfield_0=float(i * 10)) for i in (3, 1, 2)]
    )
    merged = merge_extracts(
        [MergeItem(a, "x", "1", "mean"), MergeItem(b, "y", "1", "sum")]
    )
    rows = {r["asdf_id"]: r for r in merged.collect()}
    assert all(rows[i]["y.1.sum"] == i * 10 for i in (1, 2, 3))
