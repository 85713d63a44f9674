"""Units for the round-5 wave-22 operators: rolling OLS trend."""

import math


def _slope_ref(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    if den <= 0:
        return None
    return math.floor(1e6 * (n * sxy - sx * sy) / den + 0.5)


def test_rolling_trend_matches_reference(spark):
    from det_module_spark.operators.anomaly import rolling_trend

    series = [(i, (i * i) % 23 + 3 * i) for i in range(20)]
    df = spark.createDataFrame(
        [("k",) + p for p in series], ["key", "x", "y"]
    )
    got = {
        r["x"]: (r["n_pts"], r["slope_ppm"])
        for r in rolling_trend(df, "key", "x", "y", window=5).collect()
    }
    for i, (x, _y) in enumerate(series):
        frame = series[max(0, i - 4) : i + 1]
        n_pts, slope = got[x]
        assert n_pts == len(frame)
        if len(frame) < 5:
            assert slope is None  # short frame: no slope emitted
        else:
            assert slope == _slope_ref(frame), x


def test_rolling_trend_detects_turn(spark):
    from det_module_spark.operators.anomaly import rolling_trend

    # up 10 points then down 10 points: slope flips sign
    series = [(i, 100 + 5 * i) for i in range(10)] + [
        (10 + i, 145 - 7 * i) for i in range(10)
    ]
    df = spark.createDataFrame(
        [("k",) + p for p in series], ["key", "x", "y"]
    )
    rows = sorted(
        (r["x"], r["slope_ppm"])
        for r in rolling_trend(df, "key", "x", "y", window=4).collect()
        if r["slope_ppm"] is not None
    )
    assert rows[0][1] == 5_000_000  # pure ascent
    assert rows[-1][1] == -7_000_000  # pure descent


def test_rolling_trend_zero_variance_x_is_null(spark):
    from det_module_spark.operators.anomaly import rolling_trend

    df = spark.createDataFrame(
        [("k", 5, v) for v in (1, 2, 3)], ["key", "x", "y"]
    )
    rows = rolling_trend(df, "key", "x", "y", window=3).collect()
    assert all(r["slope_ppm"] is None for r in rows)
