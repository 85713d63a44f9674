"""Zonal aggregate vocabulary: semantics + properties (SURVEY.md §5.2)."""

import math

import pytest
from pyspark.sql import Row

from det_module_spark.operators.extract_types import (
    EXTRACT_TYPES,
    extract_abbr,
    validate_extract_type,
    zonal_extract,
)

CELLS = [
    # (asdf_id, value, coverage, potential, category)
    (1, 10.0, 0.5, 20.0, "water"),
    (1, 20.0, 1.0, 20.0, "water"),
    (1, 30.0, 0.25, 40.0, "forest"),
    (2, 5.0, 1.0, 10.0, "desert"),
    (2, 5.0, 0.5, 10.0, "desert"),
    (2, None, 0.5, 10.0, "water"),
]


@pytest.fixture(scope="module")
def cells(spark):
    return spark.createDataFrame(
        [Row(asdf_id=a, value=v, coverage=c, potential=p, category=g)
         for a, v, c, p, g in CELLS]
    )


def _result(df, field="exfield_0"):
    return {r["asdf_id"]: r[field] for r in df.collect()}


def test_registry_abbreviations():
    # active abbreviations pinned to queue/extract_check.py:28-39
    assert extract_abbr("categorical") == "c"
    assert extract_abbr("weighted_mean") == "E"
    assert extract_abbr("weighted_count") == "N"
    assert extract_abbr("weighted_sum") == "S"
    assert extract_abbr("mean") == "e"
    assert extract_abbr("count") == "n"
    assert extract_abbr("sum") == "s"
    assert extract_abbr("min") == "m"
    assert extract_abbr("max") == "x"
    assert extract_abbr("reliability") == "r"
    assert extract_abbr("unique") == "u"
    assert extract_abbr("var") == "v"
    assert extract_abbr("std") == "d"


def test_invalid_extract_type_is_hard_error():
    # queue/extract_check.py:54-57
    with pytest.raises(ValueError):
        validate_extract_type("bogus")
    with pytest.raises(ValueError):
        zonal_extract(None, "nope")


def test_percentile_family_validates():
    assert validate_extract_type("percentile_25") == "percentile_25"
    with pytest.raises(ValueError):
        validate_extract_type("percentile_abc")


def test_basic_aggregates(cells):
    assert _result(zonal_extract(cells, "mean")) == {1: 20.0, 2: 5.0}
    assert _result(zonal_extract(cells, "count")) == {1: 3, 2: 2}  # nulls excluded
    assert _result(zonal_extract(cells, "sum")) == {1: 60.0, 2: 10.0}
    assert _result(zonal_extract(cells, "min")) == {1: 10.0, 2: 5.0}
    assert _result(zonal_extract(cells, "max")) == {1: 30.0, 2: 5.0}
    assert _result(zonal_extract(cells, "range")) == {1: 20.0, 2: 0.0}
    assert _result(zonal_extract(cells, "unique")) == {1: 3, 2: 1}
    assert _result(zonal_extract(cells, "median")) == {1: 20.0, 2: 5.0}


def test_weighted_aggregates(cells):
    wm = _result(zonal_extract(cells, "weighted_mean"))
    # (10*.5 + 20*1 + 30*.25) / (.5+1+.25) = 32.5/1.75
    assert math.isclose(wm[1], 32.5 / 1.75)
    wc = _result(zonal_extract(cells, "weighted_count"))
    assert wc[1] == 1.75 and wc[2] == 2.0
    ws = _result(zonal_extract(cells, "weighted_sum"))
    assert ws[1] == 32.5


def test_reliability_triple(cells):
    df = zonal_extract(cells, "reliability")
    rows = {r["asdf_id"]: r for r in df.collect()}
    assert rows[1]["exfield_sum"] == 60.0
    assert rows[1]["exfield_potential"] == 80.0
    # property: reliability == sum / potential (templates/field_names.txt:22)
    for r in rows.values():
        assert math.isclose(
            r["exfield_reliability"], r["exfield_sum"] / r["exfield_potential"]
        )


def test_categorical_pivot(cells):
    df = zonal_extract(
        cells, "categorical", categories=["water", "forest", "desert"]
    )
    rows = {r["asdf_id"]: r for r in df.collect()}
    assert rows[1]["exfield_water"] == 2
    assert rows[1]["exfield_forest"] == 1
    assert rows[1]["exfield_desert"] == 0  # zero-filled
    # property: category counts sum to total cell count (incl. null values)
    assert sum(rows[2][f"exfield_{c}"] for c in ["water", "forest", "desert"]) == 3


def test_majority_minority_deterministic_ties(cells):
    maj = _result(zonal_extract(cells, "majority"))
    assert maj[2] == 5.0
    # feature 1 has all-distinct values -> tie broken to smallest value
    assert maj[1] == 10.0
    mino = _result(zonal_extract(cells, "minority"))
    assert mino[1] == 10.0
    assert mino[2] == 5.0


def test_active_flags_match_reference():
    active = {n for n, t in EXTRACT_TYPES.items() if t.active}
    assert active == {
        "categorical", "weighted_mean", "weighted_count", "weighted_sum",
        "mean", "count", "sum", "min", "max", "reliability",
    }
