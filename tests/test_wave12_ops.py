"""Units for the round-5 wave-12 additions: exact two-sample KS and
the Spark-4 built-in XML source round trip."""

from pyspark.sql import functions as F


def test_ks_drift_exact_values(spark):
    from det_module_spark.operators.quality import ks_drift

    # A = {1, 2}, B = {3, 4}: disjoint supports -> D = 1
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3),
            ("g", False, 4)]
    df = spark.createDataFrame(rows, ["s", "ia", "x"])
    [r] = ks_drift(df, "s", F.col("ia"), F.col("x")).collect()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["d_num"] == 4  # sup gap = n_a*n_b
    assert r["d_ppm"] == 1_000_000

    # identical samples -> D = 0
    same = [("g", True, v) for v in [1, 2, 3]] + [
        ("g", False, v) for v in [1, 2, 3]
    ]
    [r2] = ks_drift(
        spark.createDataFrame(same, ["s", "ia", "x"]),
        "s",
        F.col("ia"),
        F.col("x"),
    ).collect()
    assert r2["d_num"] == 0


def test_ks_drift_interleaved_hand_value(spark):
    from det_module_spark.operators.quality import ks_drift

    # A = {1, 3}, B = {2, 4}: cum gaps |cuma*2 - cumb*2| at x=1,2,3,4
    # = 2, 0, 2, 0 -> D = 2/4 = 0.5
    rows = [("g", True, 1), ("g", True, 3), ("g", False, 2),
            ("g", False, 4)]
    [r] = ks_drift(
        spark.createDataFrame(rows, ["s", "ia", "x"]),
        "s",
        F.col("ia"),
        F.col("x"),
    ).collect()
    assert r["d_ppm"] == 500_000


def test_xml_roundtrip(spark, tmp_path):
    from det_module_spark.sources.xml_source import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta <&>", -3.0)], ["k", "name", "v"]
    )
    path = str(tmp_path / "xml_out")
    write_xml(df, path)
    got = sorted(
        (r["k"], r["name"], r["v"])
        for r in read_xml(spark, path).collect()
    )
    # XML escaping round-trips special characters
    assert got == [(1, "alpha", 1.5), (2, "beta <&>", -3.0)]


def test_wasserstein_drift_exact_shift(spark):
    from det_module_spark.operators.quality import wasserstein_drift

    # B is A shifted by +10: W1 = 10 exactly
    a = [("g", True, v) for v in [1, 5, 9]]
    b = [("g", False, v + 10) for v in [1, 5, 9]]
    df = spark.createDataFrame(a + b, ["s", "ia", "x"])
    [r] = wasserstein_drift(df, "s", F.col("ia"), F.col("x")).collect()
    assert r["w1_milli"] == 10_000
    # identical samples -> 0
    same = [("g", True, v) for v in [2, 4]] + [
        ("g", False, v) for v in [2, 4]
    ]
    [r2] = wasserstein_drift(
        spark.createDataFrame(same, ["s", "ia", "x"]),
        "s",
        F.col("ia"),
        F.col("x"),
    ).collect()
    assert r2["w1_num"] == 0


def test_wasserstein_vs_ks_sensitivity(spark):
    from det_module_spark.operators.quality import ks_drift
    from det_module_spark.operators.quality import wasserstein_drift

    # one far outlier: KS stays small (1/n gap), W1 grows with the
    # distance — the two tests see different failure modes
    a = [("g", True, v) for v in range(10)]
    b = [("g", False, v) for v in range(9)] + [("g", False, 1000)]
    df = spark.createDataFrame(a + b, ["s", "ia", "x"])
    [k] = ks_drift(df, "s", F.col("ia"), F.col("x")).collect()
    [w] = wasserstein_drift(df, "s", F.col("ia"), F.col("x")).collect()
    assert k["d_ppm"] == 100_000  # 1/10
    assert w["w1_milli"] > 50_000  # ~ (1000-9)/10 units
