"""Units for wave-23: distributed logistic regression (quantized
Newton rounds)."""

import math


def _logreg_ref(rows, rounds=3):
    """Pure-python mirror of glm.logreg_sql: quantized beta (1e-9),
    per-row terms quantized to 1e-6 before exact integer sums,
    adjugate solve in double."""
    QB, QT = 1e9, 1e6
    b = [0, 0, 0]  # quantized longs
    for _ in range(rounds):
        sums = {k: 0 for k in (
            "g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22"
        )}
        for y, x1, x2 in rows:
            z = (b[0] + b[1] * x1 + b[2] * x2) / QB
            p = 1.0 / (1.0 + math.exp(-z))
            r, w = y - p, p * (1.0 - p)
            for k, v in (
                ("g0", r), ("g1", r * x1), ("g2", r * x2),
                ("h00", w), ("h01", w * x1), ("h02", w * x2),
                ("h11", w * x1 * x1), ("h12", w * x1 * x2),
                ("h22", w * x2 * x2),
            ):
                sums[k] += math.floor(v * QT + 0.5)
        g0, g1, g2 = (sums[k] / QT for k in ("g0", "g1", "g2"))
        h00, h01, h02, h11, h12, h22 = (
            sums[k] / QT
            for k in ("h00", "h01", "h02", "h11", "h12", "h22")
        )
        a00 = h11 * h22 - h12 * h12
        a01 = h02 * h12 - h01 * h22
        a02 = h01 * h12 - h02 * h11
        a11 = h00 * h22 - h02 * h02
        a12 = h01 * h02 - h00 * h12
        a22 = h00 * h11 - h01 * h01
        det = h00 * a00 + h01 * a01 + h02 * a02
        b = [
            b[0] + math.floor((a00 * g0 + a01 * g1 + a02 * g2) / det * QB + 0.5),
            b[1] + math.floor((a01 * g0 + a11 * g1 + a12 * g2) / det * QB + 0.5),
            b[2] + math.floor((a02 * g0 + a12 * g1 + a22 * g2) / det * QB + 0.5),
        ]
    return b


def _dataset():
    # y depends on x1 (positive) and not on x2, plus deterministic noise
    rows = []
    for i in range(400):
        x1 = (i * 7) % 11 - 5
        x2 = (i * 13) % 9 - 4
        y = 1 if (3 * x1 + ((i * 29) % 17) - 8) > 0 else 0
        rows.append((y, x1, x2))
    return rows


def test_logreg_fit_matches_quantized_reference(spark):
    from det_module_spark.operators.glm import logreg_fit

    rows = _dataset()
    df = spark.createDataFrame(rows, ["y", "x1", "x2"])
    got = {
        r["coef"]: r["beta_q"]
        for r in logreg_fit(df, "y", "x1", "x2", rounds=3).collect()
    }
    ref = _logreg_ref(rows, rounds=3)
    assert [got["b0"], got["b1"], got["b2"]] == ref


def test_logreg_learns_the_informative_feature(spark):
    from det_module_spark.operators.glm import logreg_fit

    rows = _dataset()
    df = spark.createDataFrame(rows, ["y", "x1", "x2"])
    got = {
        r["coef"]: r["beta_q"]
        for r in logreg_fit(df, "y", "x1", "x2", rounds=3).collect()
    }
    # x1 drives the label: its weight dominates the noise feature
    assert got["b1"] > 0
    assert abs(got["b1"]) > 5 * abs(got["b2"])


def test_logreg_partition_independent(spark):
    from det_module_spark.operators.glm import logreg_fit

    rows = _dataset()
    a = logreg_fit(
        spark.createDataFrame(rows, ["y", "x1", "x2"]).repartition(1),
        "y", "x1", "x2",
    ).collect()
    b = logreg_fit(
        spark.createDataFrame(rows, ["y", "x1", "x2"]).repartition(13),
        "y", "x1", "x2",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_logreg_calibration_bins_are_consistent(spark):
    from det_module_spark.operators.glm import logreg_calibrate

    rows = _dataset()
    df = spark.createDataFrame(rows, ["y", "x1", "x2"])
    out = logreg_calibrate(df, "y", "x1", "x2", rounds=3, bins=10)
    got = [(r["bin"], r["n"], r["pred_ppm"], r["obs_ppm"]) for r in out.collect()]
    assert sum(n for _, n, _, _ in got) == len(rows)
    for b, _n, pred, obs in got:
        assert 0 <= b <= 9
        # bin b holds predictions in [b/10, (b+1)/10)
        assert b * 100_000 <= pred < (b + 1) * 100_000 + 1
        assert 0 <= obs <= 1_000_000
    # a separable-ish dataset must be directionally calibrated:
    # observed rate grows with the predicted bin
    obs_by_bin = [(b, o) for b, _n, _p, o in got]
    assert obs_by_bin == sorted(obs_by_bin)


def test_knn_classify_query_majority(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["knn_classify"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r["n_votes"] <= 10
