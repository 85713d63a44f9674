"""Round-7 second review wave: regression tests for the session's
module sweep over the previously-unread files (kmeans, glm, spatial,
geometry, extract_types, hierarchy, seqpattern, pdfwriter,
protofallback — ROUND_NOTES r6 ninth wave listed them as the R7
review queue).

Findings fixed and pinned here:
1. glm._solve_round — an empty feature frame surfaced as a TypeError
   (None / float) and a singular Hessian as OverflowError inside
   math.floor, three frames below the cause; both now raise a
   ValueError that names the condition.

The remaining modules read clean; the deliberate contracts that the
sweep CONFIRMED rather than changed are pinned too, so a future edit
that breaks them fails a named test instead of a driver hash:
2. kmeans seeds centroids from ``id < k`` (documented contract) —
   an id space disjoint from [0, k) yields an empty frame, not a
   crash, and the oracle mirrors it.
3. pdfwriter._wrap never emits an over-width line and never loses
   non-space characters (the docbuilder feeds it arbitrary field
   values).
4. protofallback round-trips packed repeated numerics (wire type 2
   on a varint field) even though the StateMessage schema itself
   never packs.
"""

import pytest


# ---------------------------------------------------------------
# 1. glm loud degenerate-input errors
# ---------------------------------------------------------------

def test_logreg_empty_frame_raises_valueerror(spark):
    from det_module_spark.operators.glm import logreg_fit

    df = spark.createDataFrame([], "y double, x1 double, x2 double")
    with pytest.raises(ValueError, match="empty feature frame"):
        logreg_fit(df, "y", "x1", "x2", rounds=1)


def test_logreg_singular_hessian_raises_valueerror(spark):
    from det_module_spark.operators.glm import logreg_fit

    # x2 = 2·x1 exactly: collinear features => rank-deficient Hessian
    rows = [(float(i % 2), float(i), 2.0 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    with pytest.raises(ValueError, match="singular Hessian"):
        logreg_fit(df, "y", "x1", "x2", rounds=1)


def test_logreg_guard_does_not_touch_healthy_fit(spark):
    from det_module_spark.operators.glm import logreg_fit

    rows = [
        (1.0 if (i % 3) else 0.0, float(i), float((i * 7) % 5))
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = {r.coef: r.beta_q for r in logreg_fit(df, "y", "x1", "x2").collect()}
    assert set(out) == {"b0", "b1", "b2"}
    assert all(isinstance(v, int) for v in out.values())


# ---------------------------------------------------------------
# 2. kmeans id-seed contract (confirmed behavior, pinned)
# ---------------------------------------------------------------

def test_kmeans_disjoint_id_space_is_empty_not_crash(spark):
    from det_module_spark.operators.kmeans import kmeans_fit_predict

    df = spark.createDataFrame(
        [(100, [0.1, 0.2]), (101, [0.3, 0.4])],
        "vec_id long, embedding array<double>",
    )
    assert kmeans_fit_predict(df, k=2, iters=1).count() == 0


# ---------------------------------------------------------------
# 3. pdfwriter wrap invariants
# ---------------------------------------------------------------

def test_pdf_wrap_width_and_char_preservation():
    from det_module_spark.sources.pdfwriter import _wrap

    cases = [
        "",
        "short",
        "x" * 250,  # unbroken token, multiple hard splits
        ("word " * 60).strip(),
        "a " + "y" * 95 + " tail words here",
        " leading and   multiple   spaces ",
    ]
    for line in cases:
        out = _wrap(line, width=90)
        assert all(len(seg) <= 90 for seg in out), (line, out)
        # every non-space character survives, in order
        assert "".join(out).replace(" ", "") == line.replace(" ", "")


# ---------------------------------------------------------------
# 4. protofallback packed repeated decode
# ---------------------------------------------------------------

def test_protofallback_reads_packed_repeated_varints():
    from det_module_spark.vendor.protofallback.google.protobuf._mini import (
        LABEL_REPEATED,
        TYPE_INT64,
        FieldDescriptor,
        Message,
        write_varint,
    )

    # hand-build a descriptor with one repeated int64 field (number 1)
    fd = FieldDescriptor.__new__(FieldDescriptor)
    fd.name = "vals"
    fd.number = 1
    fd.label = LABEL_REPEATED
    fd.type = TYPE_INT64
    fd.type_name = None
    fd.oneof_index = None
    fd.proto3_optional = False
    fd.message_type = None

    class _D:
        full_name = name = "T"
        fields = [fd]
        fields_by_name = {"vals": fd}
        fields_by_number = {1: fd}
        oneofs = []

    cls = type("T", (Message,), {"DESCRIPTOR": _D})

    # packed encoding: tag (field 1, wire 2), length, then varints
    payload = bytearray()
    for v in (3, 270, 86942):
        write_varint(payload, v)
    buf = bytearray()
    write_varint(buf, 1 << 3 | 2)
    write_varint(buf, len(payload))
    buf += payload

    m = cls()
    m.ParseFromString(bytes(buf))
    assert list(m.vals) == [3, 270, 86942]

    # and the unpacked form still round-trips through our serializer
    m2 = cls()
    m2.vals.extend([5, 6])
    m3 = cls()
    m3.ParseFromString(m2.SerializeToString())
    assert list(m3.vals) == [5, 6]


# ---------------------------------------------------------------
# 5. asof_join: NULL-timestamp build rows are excluded
# ---------------------------------------------------------------

def test_asof_null_build_ts_not_carried(spark):
    from det_module_spark.operators.asof import asof_join

    probe = spark.createDataFrame(
        [("k", 100)], "key string, ts long"
    )
    build = spark.createDataFrame(
        [("k", None, 999), ("k", 50, 7)],
        "key string, ts long, v long",
    )
    out = asof_join(probe, build, "key", "ts", ["v"]).collect()
    assert len(out) == 1
    # the NULL-ts build row (v=999) must NOT be the carried value;
    # the real ts=50 row is the as-of match and its ts is reported
    assert out[0]["asof_v"] == 7
    assert out[0]["asof_ts"] == 50


def test_asof_all_null_build_ts_means_no_match(spark):
    from det_module_spark.operators.asof import asof_join

    probe = spark.createDataFrame([("k", 100)], "key string, ts long")
    build = spark.createDataFrame(
        [("k", None, 999)], "key string, ts long, v long"
    )
    out = asof_join(probe, build, "key", "ts", ["v"]).collect()
    assert len(out) == 1
    assert out[0]["asof_v"] is None and out[0]["asof_ts"] is None


# ---------------------------------------------------------------
# 6. cdc_apply: NULL keys match null-safely (snapshot_diff replay)
# ---------------------------------------------------------------

def test_cdc_apply_null_key_update_and_delete(spark):
    from det_module_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [(None, 1), ("a", 2)], "k string, v long"
    )
    upd = spark.createDataFrame(
        [(None, 10, 1, "U")], "k string, v long, seq long, op string"
    )
    out = {r.k: r.v for r in cdc_apply(snap, upd, "k", ["v"]).collect()}
    assert out == {None: 10, "a": 2}

    dele = spark.createDataFrame(
        [(None, None, 1, "D")], "k string, v long, seq long, op string"
    )
    out2 = {r.k: r.v for r in cdc_apply(snap, dele, "k", ["v"]).collect()}
    assert out2 == {"a": 2}


def test_snapshot_diff_replays_through_cdc_apply_with_null_keys(spark):
    from det_module_spark.operators.scd import cdc_apply, snapshot_diff

    old = spark.createDataFrame(
        [(None, 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    new = spark.createDataFrame(
        [(None, 9), ("a", 2), ("c", 4)], "k string, v long"
    )
    diff = snapshot_diff(old, new, "k", ["v"])
    changes = diff.selectExpr(
        "k",
        "new_v AS v",
        "CAST(1 AS LONG) AS seq",
        "CASE change_op WHEN 'delete' THEN 'D' WHEN 'insert' THEN 'I'"
        " ELSE 'U' END AS op",
    )
    replayed = {
        r.k: r.v for r in cdc_apply(old, changes, "k", ["v"]).collect()
    }
    assert replayed == {None: 9, "a": 2, "c": 4}
