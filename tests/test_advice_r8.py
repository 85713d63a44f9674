"""Round-8 ADVICE fixes, pinned.

1. asof.py (medium): a NULL-timestamp PROBE row sorts NULLS-FIRST, so
   in the forward direction its [0, unboundedFollowing) frame held
   every build row and it spuriously matched the earliest one.
   Now: NULL-ts probes are unmatched in BOTH directions, with and
   without tolerance (DuckDB ASOF / pandas merge_asof semantics).
2. asof.py (medium): a build row with a non-NULL ts but NULL value
   column was skipped by last(value, ignorenulls=True), carrying an
   OLDER row's value while asof_ts reported the nearer row. Now the
   match is carried as ONE struct (ts + all values picked from the
   same build row), so build (50,5),(90,NULL) at probe 100 yields
   (90, NULL) — the DuckDB ASOF answer.
3. glm.py (low): logreg_sql's docstring now states the deliberate
   degenerate-input divergence from the driver path (SQL can't raise;
   NULL propagation / div-by-0 instead). Doc-only — the healthy-path
   parity tests in test_wave23_glm.py still pin value equality.
"""

from det_module_spark.operators.asof import asof_join


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


# ---------------------------------------------------------------
# 1. NULL-ts probe rows are unmatched (both directions)
# ---------------------------------------------------------------

def test_asof_forward_null_probe_ts_unmatched(spark):
    build = _rows(spark, [("k", 50, 7), ("k", 90, 9)], "key string, ts long, v long")
    probe = _rows(spark, [("k", None, 1), ("k", 60, 2)], "key string, ts long, pid long")
    out = {r.pid: r for r in asof_join(
        probe, build, "key", "ts", ["v"], direction="forward"
    ).collect()}
    assert out[1].asof_ts is None and out[1].asof_v is None
    assert out[2].asof_ts == 90 and out[2].asof_v == 9


def test_asof_backward_null_probe_ts_unmatched(spark):
    build = _rows(spark, [("k", 50, 7)], "key string, ts long, v long")
    probe = _rows(spark, [("k", None, 1), ("k", 60, 2)], "key string, ts long, pid long")
    out = {r.pid: r for r in asof_join(probe, build, "key", "ts", ["v"]).collect()}
    assert out[1].asof_ts is None and out[1].asof_v is None
    assert out[2].asof_ts == 50 and out[2].asof_v == 7


def test_asof_forward_null_probe_ts_with_tolerance(spark):
    build = _rows(spark, [("k", 50, 7)], "key string, ts long, v long")
    probe = _rows(spark, [("k", None, 1)], "key string, ts long, pid long")
    out = asof_join(
        probe, build, "key", "ts", ["v"],
        direction="forward", tolerance_seconds=1e9,
    ).collect()
    assert out[0].asof_ts is None and out[0].asof_v is None


# ---------------------------------------------------------------
# 2. ts and values always come from the SAME build row
# ---------------------------------------------------------------

def test_asof_null_value_build_row_is_still_the_match(spark):
    # DuckDB ASOF: probe 100 matches build (90, NULL) -> (90, NULL),
    # never (90, 5) or (50, 5).
    build = _rows(spark, [("k", 50, 5), ("k", 90, None)],
                  "key string, ts long, v long")
    probe = _rows(spark, [("k", 100, 1)], "key string, ts long, pid long")
    out = asof_join(probe, build, "key", "ts", ["v"]).collect()
    assert out[0].asof_ts == 90 and out[0].asof_v is None


def test_asof_forward_null_value_build_row_is_still_the_match(spark):
    build = _rows(spark, [("k", 90, None), ("k", 150, 5)],
                  "key string, ts long, v long")
    probe = _rows(spark, [("k", 80, 1)], "key string, ts long, pid long")
    out = asof_join(
        probe, build, "key", "ts", ["v"], direction="forward"
    ).collect()
    assert out[0].asof_ts == 90 and out[0].asof_v is None


def test_asof_multi_value_cols_atomic(spark):
    # Two value columns, one NULL on the nearest row: both outputs
    # come from that row.
    build = _rows(spark, [("k", 50, 5, 55), ("k", 90, None, 99)],
                  "key string, ts long, a long, b long")
    probe = _rows(spark, [("k", 100, 1)], "key string, ts long, pid long")
    out = asof_join(probe, build, "key", "ts", ["a", "b"]).collect()
    assert out[0].asof_ts == 90
    assert out[0].asof_a is None and out[0].asof_b == 99


def test_asof_tolerance_still_exact_after_struct_carry(spark):
    build = _rows(spark, [("k", 50, 5)], "key string, ts long, v long")
    probe = _rows(spark, [("k", 60, 1), ("k", 10_000_000, 2)],
                  "key string, ts long, pid long")
    # integer ts casts to timestamp as SECONDS inside the operator
    out = {r.pid: r for r in asof_join(
        probe, build, "key", "ts", ["v"], tolerance_seconds=10
    ).collect()}
    # pid=1 gap 10s <= 10s -> match; pid=2 gap ~1e7s -> nulled
    assert out[1].asof_ts == 50 and out[1].asof_v == 5
    assert out[2].asof_ts is None and out[2].asof_v is None


# ---------------------------------------------------------------
# 3. glm divergence documented (guard the doc contract exists)
# ---------------------------------------------------------------

def test_logreg_sql_documents_degenerate_divergence():
    from det_module_spark.operators.glm import logreg_sql
    doc = logreg_sql.__doc__ or ""
    assert "Degenerate-input contract" in doc
    assert "singular" in doc.lower()
