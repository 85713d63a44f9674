"""CDC apply and SCD2 history unit tests (edge cases the driver query
doesn't reach: insert of a brand-new key, delete-then-reinsert order,
keys with no changes)."""

from __future__ import annotations


def test_cdc_apply_insert_update_delete(spark):
    from det_module_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    changes = spark.createDataFrame(
        [
            (1, 100, "U", 11),   # update existing
            (2, 101, "D", 0),    # delete existing
            (4, 102, "I", 40),   # insert brand-new key
            (5, 103, "D", 0),    # delete of a key that never existed
            (1, 99, "U", 999),   # stale change, lower seq -> ignored
        ],
        "k long, seq long, op string, v long",
    )
    out = {r.k: r.v for r in cdc_apply(snap, changes, "k", ["v"]).collect()}
    assert out == {1: 11, 3: 30, 4: 40}


def test_cdc_delete_then_reinsert_by_seq(spark):
    from det_module_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame([(1, 10)], "k long, v long")
    changes = spark.createDataFrame(
        [(1, 5, "D", 0), (1, 6, "I", 77)], "k long, seq long, op string, v long"
    )
    out = {r.k: r.v for r in cdc_apply(snap, changes, "k", ["v"]).collect()}
    assert out == {1: 77}  # the later insert wins over the delete


def test_scd2_versions_and_current_flag(spark):
    from det_module_spark.operators.scd import scd2_history

    initial = spark.createDataFrame([(1, "gold"), (2, "iron")], "k long, a string")
    upd = spark.createDataFrame(
        [(1, "silver", "2020-01-01", 1), (1, "bronze", "2021-06-01", 2)],
        "k long, a string, ts string, seq long",
    )
    hist = scd2_history(initial, upd, "k", "a", ts="ts", seq="seq").collect()
    k1 = sorted(
        [r for r in hist if r.k == 1],
        key=lambda r: (r.valid_from is not None, r.valid_from or ""),
    )
    assert [r.a for r in k1] == ["gold", "silver", "bronze"]
    assert k1[0].valid_from is None and k1[0].valid_to == "2020-01-01"
    assert k1[1].valid_to == "2021-06-01"
    assert k1[2].valid_to is None and k1[2].is_current
    assert not k1[0].is_current and not k1[1].is_current
    k2 = [r for r in hist if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current  # untouched key: one open row
