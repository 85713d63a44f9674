"""S9 un-gated: real TIFF files through read_raster_cells via the
pure baseline codec (sources/tiff.py), nodata → null verified
(VERDICT r01 #6 'done' bar). Reference contract: queue/msr_check.py:
43-45 (raster file → value grid), queue/request_tools.py:454-476."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from det_module_spark.sources.raster import read_raster_cells
from det_module_spark.sources.tiff import read_tiff, tiff_info, write_tiff


@pytest.fixture()
def f32_tif(tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.normal(50, 10, size=(45, 60)).astype(np.float32)
    arr[arr < 40] = -9999.0  # nodata holes
    path = str(tmp_path / "cov.tif")
    write_tiff(path, arr, nodata=-9999.0, rows_per_strip=16)
    return path, arr


def test_codec_roundtrip_strip_and_tile(tmp_path):
    rng = np.random.default_rng(3)
    cases = [
        (rng.normal(size=(37, 53)).astype(np.float32),
         dict(rows_per_strip=10, byte_order="<")),
        (rng.integers(-500, 500, size=(40, 70)).astype(np.int16),
         dict(tile=(32, 16), byte_order=">")),
        (rng.integers(0, 255, size=(21, 33)).astype(np.uint8), dict()),
        (rng.normal(size=(16, 16)).astype(np.float64),
         dict(tile=(16, 16))),
    ]
    for i, (arr, kw) in enumerate(cases):
        p = str(tmp_path / f"t{i}.tif")
        write_tiff(p, arr, **kw)
        back, nodata = read_tiff(p)
        assert nodata is None
        assert back.dtype == arr.dtype.newbyteorder("=")
        assert np.array_equal(back, arr)


def test_codec_windowed_read_equals_slice(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 10_000, size=(90, 130)).astype(np.int32)
    strip = str(tmp_path / "s.tif")
    tiled = str(tmp_path / "t.tif")
    write_tiff(strip, arr, rows_per_strip=7)
    write_tiff(tiled, arr, tile=(48, 32))
    for p in (strip, tiled):
        for win in [(0, 0, 130, 90), (13, 27, 41, 22), (100, 80, 30, 10)]:
            x0, y0, w, h = win
            got, _ = read_tiff(p, window=win)
            assert np.array_equal(got, arr[y0:y0 + h, x0:x0 + w]), (p, win)


def test_codec_rejects_out_of_bounds_window(tmp_path):
    p = str(tmp_path / "b.tif")
    write_tiff(p, np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        read_tiff(p, window=(4, 4, 8, 8))


def test_codec_skips_undefined_type_tag(tmp_path):
    """ADVICE r02: a type-7 (UNDEFINED) tag is legal TIFF 6.0 and
    common in real files (e.g. XMP/EXIF payloads) — the parser must
    skip it, not KeyError. Splice an UNDEFINED-typed entry into a
    valid file's IFD by rewriting one benign tag's type in place."""
    import struct

    p = str(tmp_path / "u.tif")
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    write_tiff(p, arr)
    buf = bytearray(open(p, "rb").read())
    bo = "<" if bytes(buf[:2]) == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", bytes(buf[4:8]))
    (n,) = struct.unpack(bo + "H", bytes(buf[ifd_off:ifd_off + 2]))
    patched = False
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack(
            bo + "HHI", bytes(buf[off:off + 8])
        )
        if tag == 262:  # photometric: benign to lose, inline value
            buf[off + 2:off + 4] = struct.pack(bo + "H", 7)
            patched = True
            break
    assert patched
    open(p, "wb").write(bytes(buf))
    back, _ = read_tiff(p)  # no KeyError
    assert np.array_equal(back, arr)
    assert tiff_info(p)["width"] == 8


def test_read_raster_cells_real_file(spark, f32_tif):
    path, arr = f32_tif
    cells = read_raster_cells(
        spark, [("cov", "2020", path)], tile_size=32
    ).toPandas()
    assert len(cells) == arr.size
    # nodata → null
    n_nodata = int((arr == -9999.0).sum())
    assert int(cells["value"].isna().sum()) == n_nodata
    # spot-check exact values at their grid positions
    got = {
        (r.cell_y, r.cell_x): r.value
        for r in cells.itertuples()
        if not np.isnan(r.value)
    }
    for (y, x), v in list(got.items())[:50]:
        assert v == pytest.approx(float(arr[y, x]))


def test_read_raster_cells_zonal_agg_matches_numpy(spark, f32_tif):
    path, arr = f32_tif
    cells = read_raster_cells(spark, [("cov", "2020", path)], tile_size=17)
    got = cells.agg(
        F.count("value").alias("n"),
        F.sum("value").alias("s"),
    ).collect()[0]
    valid = arr[arr != -9999.0].astype(np.float64)
    assert got["n"] == valid.size
    assert got["s"] == pytest.approx(valid.sum(), rel=1e-9)


def test_read_raster_cells_multiple_files_and_info(spark, tmp_path):
    a = np.arange(12, dtype=np.int16).reshape(3, 4)
    b = (np.arange(12, dtype=np.int16) * 2).reshape(3, 4)
    pa_, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    write_tiff(pa_, a)
    write_tiff(pb, b)
    assert tiff_info(pa_)["width"] == 4
    cells = read_raster_cells(
        spark, [("d", "2000", pa_), ("d", "2001", pb)]
    )
    out = (
        cells.groupBy("temporal")
        .agg(F.sum("value").alias("s"))
        .orderBy("temporal")
        .collect()
    )
    assert [r["s"] for r in out] == [66.0, 132.0]


try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    _dtypes = st.sampled_from(["u1", "i2", "i4", "f4", "f8"])

    @st.composite
    def _tiff_case(draw):
        h = draw(st.integers(1, 40))
        w = draw(st.integers(1, 40))
        dt = draw(_dtypes)
        rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
        if dt.startswith("f"):
            arr = rng.normal(size=(h, w)).astype(dt)
        else:
            info = np.iinfo(dt)
            arr = rng.integers(
                info.min, info.max, size=(h, w), endpoint=True
            ).astype(dt)
        layout = draw(
            st.one_of(
                st.none(),  # single strip
                st.integers(1, h),  # rows per strip
                st.tuples(
                    st.sampled_from([16, 32]), st.sampled_from([16, 32])
                ),  # tile dims
            )
        )
        bo = draw(st.sampled_from(["<", ">"]))
        x0 = draw(st.integers(0, w - 1))
        y0 = draw(st.integers(0, h - 1))
        ww = draw(st.integers(1, w - x0))
        wh = draw(st.integers(1, h - y0))
        return arr, layout, bo, (x0, y0, ww, wh)

    @settings(max_examples=40, deadline=None)
    @given(_tiff_case())
    def test_codec_roundtrip_property(tmp_path_factory, case):
        arr, layout, bo, window = case
        path = str(tmp_path_factory.mktemp("hyp") / "t.tif")
        kw = {"byte_order": bo}
        if isinstance(layout, tuple):
            kw["tile"] = layout
        elif layout is not None:
            kw["rows_per_strip"] = layout
        write_tiff(path, arr, **kw)
        full, nodata = read_tiff(path)
        assert nodata is None
        assert np.array_equal(full, arr)
        x0, y0, w, h = window
        win, _ = read_tiff(path, window=window)
        assert np.array_equal(win, arr[y0:y0 + h, x0:x0 + w])


def test_downsample_cells_blocks_and_nulls(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "dataset": ["d"] * 8,
            "temporal": ["t"] * 8,
            "cell_y": [0, 0, 1, 1, 0, 0, 1, 1],
            "cell_x": [0, 1, 0, 1, 2, 3, 2, 3],
            "value": [1.0, 2.0, 3.0, None, 10.0, 20.0, 30.0, 40.0],
        }
    )
    from det_module_spark.sources.raster import downsample_cells

    out = downsample_cells(spark.createDataFrame(pdf), factor=2)
    rows = {(r["block_y"], r["block_x"]): r for r in out.collect()}
    assert rows[(0, 0)]["n_cells"] == 3  # null not counted
    assert rows[(0, 0)]["mean_value"] == pytest.approx(2.0)
    assert rows[(0, 1)]["min_value"] == 10.0
    assert rows[(0, 1)]["max_value"] == 40.0


def test_nearest_centroid_tie_breaks_to_lowest_id(spark):
    from det_module_spark.operators.spatial import nearest_centroid_join

    pts = spark.createDataFrame(
        [(0, 5.0, 0.0), (1, 2.0, 0.0)], "point_id INT, lon DOUBLE, lat DOUBLE"
    )
    centers = spark.createDataFrame(
        [(7, 0.0, 0.0), (3, 10.0, 0.0)],
        "center_id INT, cx DOUBLE, cy DOUBLE",
    )
    rows = {r["point_id"]: r for r in
            nearest_centroid_join(pts, centers).collect()}
    # point 0 is exactly equidistant (d2=25) -> lowest center id wins
    assert rows[0]["nearest_id"] == 3
    assert rows[0]["dist2"] == 25.0
    assert rows[1]["nearest_id"] == 7


def test_cell_trend_recovers_known_slope(spark):
    import pandas as pd

    from det_module_spark.sources.raster import cell_trend

    rows = []
    for t in range(10):
        rows.append({"cell_y": 0, "cell_x": 0, "t": t,
                     "value": 3.0 + 2.5 * t})          # exact line
        rows.append({"cell_y": 0, "cell_x": 1, "t": t,
                     "value": None if t % 2 else 7.0 - 1.5 * t})
    rows.append({"cell_y": 1, "cell_x": 0, "t": 0, "value": 4.0})  # n=1
    out = {(r["cell_y"], r["cell_x"]): r
           for r in cell_trend(spark.createDataFrame(pd.DataFrame(rows))).collect()}
    assert out[(0, 0)]["slope"] == pytest.approx(2.5)
    assert out[(0, 0)]["intercept"] == pytest.approx(3.0)
    assert out[(0, 1)]["slope"] == pytest.approx(-1.5)  # fits the non-null half
    assert out[(0, 1)]["n"] == 5
    assert out[(1, 0)]["slope"] is None  # degenerate: single point
