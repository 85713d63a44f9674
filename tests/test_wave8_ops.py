"""Units for the round-5 wave-8 operators: Poisson-bootstrap CI and
partition content checksums (simpson_audit is a query-level
composition covered by the driver oracle)."""

import math

from pyspark.sql import functions as F


# -------------------------------------------------------- bootstrap


def test_poisson_weights_match_cdf_inversion(spark):
    from det_module_spark.operators.bootstrap import (
        POISSON1_CDF_Q,
        _poisson1_weight,
    )

    # thresholds are floor(CDF * 1e6) of Poisson(1)
    e1 = math.exp(-1.0)
    acc, fact = 0.0, 1
    for k, t in enumerate(POISSON1_CDF_Q):
        if k:
            fact *= k
        acc += e1 / fact
        assert t == math.floor(acc * 1e6), (k, t)
    df = spark.createDataFrame(
        [(0,), (367878,), (367879,), (999405,), (999999,)], ["u"]
    )
    got = [
        r["w"]
        for r in df.select(
            _poisson1_weight(F.col("u")).alias("w")
        ).collect()
    ]
    assert got == [0, 0, 1, 6, 6]


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from det_module_spark.operators.bootstrap import bootstrap_mean_ci

    df = spark.range(0, 400).select(
        "id", (F.col("id") % 100).alias("v")
    )
    out = bootstrap_mean_ci(df, F.col("id"), F.col("v"), b=40)
    [r1] = out.collect()
    [r2] = out.collect()
    assert (r1["lo_c"], r1["hi_c"]) == (r2["lo_c"], r2["hi_c"])
    assert r1["n_boot"] == 40
    # point = floor mean of 0..99 repeated = 49
    assert r1["point_c"] == 49
    assert r1["lo_c"] <= r1["point_c"] <= r1["hi_c"]
    # CI width sane for n=400, sd≈28.9: se≈1.45, 90% CI ≈ ±2.4
    assert r1["hi_c"] - r1["lo_c"] < 15


# ------------------------------------------------ partition checksums


def test_partition_checksums_detect_any_change(spark):
    from det_module_spark.operators.quality import partition_checksums

    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30)]
    mk = lambda rs: spark.createDataFrame(rs, ["k", "p", "v"])
    repr_col = F.concat_ws(
        "|", F.col("k").cast("string"), F.col("v").cast("string")
    )
    base = {
        r["part"]: (r["n_rows"], r["xor_sig"])
        for r in partition_checksums(
            mk(rows), F.col("p"), repr_col
        ).collect()
    }
    # value change in partition a flips a's signature only
    changed = [(1, "a", 11), (2, "a", 20), (3, "b", 30)]
    got = {
        r["part"]: (r["n_rows"], r["xor_sig"])
        for r in partition_checksums(
            mk(changed), F.col("p"), repr_col
        ).collect()
    }
    assert got["b"] == base["b"]
    assert got["a"] != base["a"]
    # row order / partitioning never matters
    perm = {
        r["part"]: (r["n_rows"], r["xor_sig"])
        for r in partition_checksums(
            mk(rows[::-1]).repartition(7), F.col("p"), repr_col
        ).collect()
    }
    assert perm == base
