"""Plan expansion + normalization golden tests, modeled on the
reference's fixture request (queue/doc_test.py:12-96)."""

import pytest

from det_module_spark.functions.hashing import spec_hash
from det_module_spark.plans.spec import (
    effective_extract_type,
    msr_spec,
    normalize_filters,
    validate_request,
)
from det_module_spark.plans.planner import expand_request

FIXTURE_REQUEST = {
    "_id": "57a2ff1bc15e002f448b4568",
    "custom_name": "My Full test request",
    "status": -1,
    "priority": 0,
    "boundary": {"name": "nga_adm0_gadm28", "title": "Nigeria ADM0"},
    "release_data": [
        {
            "dataset": "aiddata_nga_v3",
            "filters": {
                "donors": ["All"],
                "ad_sector_names": ["Education"],
                "years": ["2002", "2003"],
            },
        },
        {
            "dataset": "worldbank_geocodedresearchrelease_level1_v1_4_1",
            "filters": {"donors": ["World Bank"]},
        },
    ],
    "raster_data": [
        {
            "name": "udel_precip_v401_sum",
            "options": {"extract_types": ["mean", "max"]},
            "files": [
                {"name": "udel_precip_v401_sum_1998", "path": "/x/1998.tif"},
                {"name": "udel_precip_v401_sum_1999", "path": "/x/1999.tif"},
            ],
        }
    ],
}


def test_validate_request():
    assert validate_request(FIXTURE_REQUEST)
    assert not validate_request({"boundary": {"name": "x"}})
    assert not validate_request({"release_data": [{}]})


def test_filter_normalization_prunes_noops():
    # 'All'/'None'/None entries vanish BEFORE hashing
    # (queue/request_tools.py:362-369)
    f = normalize_filters(
        {"donors": ["All"], "years": ["2002"], "sectors": ["None"], "x": [None]}
    )
    assert f == {"years": ["2002"]}
    assert normalize_filters(None) == {}
    # and the pruning changes the cache key
    assert spec_hash(msr_spec("d", {"donors": ["All"]})) == spec_hash(
        msr_spec("d", {})
    )


def test_worldbank_special_case():
    # P9: queue/request_tools.py:411-414
    assert effective_extract_type("worldbank_geocodedresearchrelease") == "sum"
    assert effective_extract_type("aiddata_nga_v3") == "reliability"


def test_expand_request_items():
    items = expand_request(FIXTURE_REQUEST)
    # 2 release -> 2 msr + 2 extract; 1 raster x 2 files x 2 types -> 4
    assert len(items) == 8
    kinds = [i.kind for i in items]
    assert kinds.count("msr") == 2 and kinds.count("extract") == 6

    msr0, ext0 = items[0], items[1]
    assert msr0.kind == "msr" and msr0.dataset == "aiddata_nga_v3"
    # the no-op 'donors: All' filter is pruned from the hashed spec
    expected_hash = spec_hash(
        {
            "dataset": "aiddata_nga_v3",
            "type": "release",
            "resolution": 0.05,
            "version": "0.1",
            "filters": {
                "ad_sector_names": ["Education"],
                "years": ["2002", "2003"],
            },
        }
    )
    assert msr0.spec_hash == expected_hash
    assert ext0.extract_type == "reliability"
    assert ext0.data == f"aiddata_nga_v3_{expected_hash}"

    wb_ext = items[3]
    assert wb_ext.extract_type == "sum"  # worldbank special case

    raster_items = items[4:]
    assert {(i.temporal, i.extract_type) for i in raster_items} == {
        ("1998", "mean"), ("1998", "max"), ("1999", "mean"), ("1999", "max"),
    }
    # identical specs hash identically; distinct specs don't
    assert len({i.spec_hash for i in items}) == len(items)


def test_expand_rejects_bad_extract_type():
    bad = dict(FIXTURE_REQUEST)
    bad["raster_data"] = [
        {"name": "r", "options": {"extract_types": ["bogus"]},
         "files": [{"name": "r_1998", "path": "/x"}]}
    ]
    with pytest.raises(ValueError):
        expand_request(bad)
