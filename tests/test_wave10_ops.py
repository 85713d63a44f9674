"""Units for the round-5 wave-10 operators: PR-curve sweep and exact
mutual information (temporal_split is a query-level composition
covered by the driver oracle)."""

import math

from pyspark.sql import functions as F


def test_pr_curve_hand_checked(spark):
    from det_module_spark.operators.quality import pr_curve

    # scores 1..4; positives are 3 and 4
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["s", "y"]
    )
    got = {
        r["threshold"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision_ppm"], r["recall_ppm"],
        )
        for r in pr_curve(
            df, F.col("s"), F.col("y"), [2, 3, 5]
        ).collect()
    }
    assert got[2] == (2, 1, 0, 666666, 1000000)
    assert got[3] == (2, 0, 0, 1000000, 1000000)
    # threshold above all scores: no predictions -> precision NULL
    assert got[5] == (0, 0, 2, None, 0)


def test_mutual_information_reference(spark):
    from det_module_spark.operators.quality import mutual_information

    # perfectly dependent: a == b; MI = ln(2) per row (2 symmetric
    # cells of 2 over N=4)
    dep = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")], ["a", "b"]
    )
    [r] = mutual_information(dep, "a", "b").collect()
    lnq = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    # each cell: c=2, ca=cb=2, N=4 -> 2*(lnq2 + lnq4 - lnq2 - lnq2)
    want = 2 * (2 * (lnq(2) + lnq(4) - lnq(2) - lnq(2)))
    assert (r["n"], r["mi_num_q"]) == (4, want)
    assert abs(r["mi_num_q"] / (4 * 1e9) - math.log(2)) < 1e-8

    # independent uniform: true MI is 0; each of the 4 cells carries
    # at most ±1 quantum of per-term ln rounding (lnq(4) − 2·lnq(2)
    # = −1 exactly), so the numerator is bounded by ±n_cells — tiny
    # against any real dependence signal
    ind = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")], ["a", "b"]
    )
    [r2] = mutual_information(ind, "a", "b").collect()
    assert abs(r2["mi_num_q"]) <= 4
