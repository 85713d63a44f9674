"""Raster source (SURVEY.md S9): GeoTIFF → long-form cell DataFrame.

The engine's raster data model is long-form cells ``(dataset,
temporal, cell_y, cell_x, value)`` at a fixed resolution (SURVEY.md
§1.1) — rasters become plain DataFrames and every zonal statistic is
a groupBy. Loading strategy, 100 TB-first:

- the *file inventory* is a DataFrame (one row per GeoTIFF ×
  temporal step, from the request's ``raster_data[].files``);
- decoding happens inside ``mapInPandas`` over that inventory: each
  task reads its own file(s) with rasterio and yields Arrow batches
  of cells — no driver-side I/O, parallelism = #files × #window
  tiles;
- tiling: large rasters are windowed into ``tile_size²`` blocks so a
  single 100k×100k GeoTIFF fans out to many tasks.

Decode backends, picked per task: rasterio when importable (full
GeoTIFF: compression, CRS, overviews), else the pure-Python baseline
codec in ``sources/tiff.py`` (uncompressed strip/tile TIFF, both byte
orders, GDAL_NODATA) — so S9 runs real files even without the geo
stack. Both backends decode WINDOWED: a task materializes only its
``tile_size²`` block. ``synthetic_raster`` remains the schema-
compatible in-memory stand-in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CELL_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("temporal", T.StringType(), False),
        T.StructField("cell_y", T.LongType(), False),
        T.StructField("cell_x", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

FILE_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("temporal", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)


def read_raster_cells(
    spark: SparkSession,
    files: list[tuple[str, str, str]],
    tile_size: int = 2048,
    band: int = 1,
) -> DataFrame:
    """(dataset, temporal, path) inventory → cell DataFrame.

    Each executor task decodes one (file, tile) window; nodata pixels
    become null values. rasterio when available, else the pure
    baseline-TIFF codec (sources/tiff.py).
    """
    inventory = spark.createDataFrame(files, schema=FILE_SCHEMA)
    inventory = inventory.repartition(max(len(files), 1))

    window_schema = T.StructType(
        list(FILE_SCHEMA.fields)
        + [
            T.StructField("x0", T.LongType(), False),
            T.StructField("y0", T.LongType(), False),
            T.StructField("w", T.LongType(), False),
            T.StructField("h", T.LongType(), False),
        ]
    )

    def _backend():
        try:  # pragma: no cover - geo stack not bundled in container
            import rasterio
            from rasterio.windows import Window

            def dims(path):
                with rasterio.open(path) as src:
                    return src.width, src.height

            def read_window(path, x0, y0, w, h):
                with rasterio.open(path) as src:
                    arr = src.read(band, window=Window(x0, y0, w, h))
                    return arr, src.nodata
        except ImportError:
            from det_module_spark.sources.tiff import read_tiff, tiff_info

            if band != 1:  # pragma: no cover
                raise NotImplementedError(
                    "multi-band TIFF needs rasterio; baseline codec is "
                    "single-band"
                )

            def dims(path):
                info = tiff_info(path)
                return info["width"], info["height"]

            def read_window(path, x0, y0, w, h):
                return read_tiff(path, window=(x0, y0, w, h))

        return dims, read_window

    def enumerate_windows(batches: Iterator) -> Iterator:
        import pandas as pd

        dims, _ = _backend()
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                width, height = dims(row.path)  # header-only probe
                for y0 in range(0, height, tile_size):
                    for x0 in range(0, width, tile_size):
                        rows.append(
                            (
                                row.dataset,
                                row.temporal,
                                row.path,
                                x0,
                                y0,
                                min(tile_size, width - x0),
                                min(tile_size, height - y0),
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "dataset", "temporal", "path", "x0", "y0", "w", "h",
                    ],
                )

    # stage 1: executor-side window enumeration (one header probe per
    # file), then a shuffle of the TINY (file × tile) inventory so
    # stage 2 really runs one task per window — the documented
    # "parallelism = #files × #window tiles" fan-out. Without the
    # explicit window table, one 100k×100k GeoTIFF decoded its ~2400
    # tiles in a single serial task.
    windows = inventory.mapInPandas(
        enumerate_windows, schema=window_schema
    ).repartition(F.col("path"), F.col("x0"), F.col("y0"))

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        _, read_window = _backend()
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                arr, nodata = read_window(
                    row.path, int(row.x0), int(row.y0), int(row.w), int(row.h)
                )
                arr = np.asarray(arr, dtype="float64")
                yy, xx = np.meshgrid(
                    np.arange(arr.shape[0]), np.arange(arr.shape[1]),
                    indexing="ij",
                )
                ys, xs = yy.ravel(), xx.ravel()
                vals = arr.ravel()
                if nodata is not None:
                    vals = np.where(vals == nodata, np.nan, vals)
                yield pd.DataFrame(
                    {
                        "dataset": row.dataset,
                        "temporal": row.temporal,
                        "cell_y": ys + int(row.y0),
                        "cell_x": xs + int(row.x0),
                        "value": vals,
                    }
                )

    return windows.mapInPandas(decode, schema=CELL_SCHEMA)


def downsample_cells(
    cells: DataFrame,
    factor: int,
    value: str = "value",
) -> DataFrame:
    """Block-aggregate a long-form cell table to a coarser grid:
    every ``factor``×``factor`` block becomes one output cell carrying
    mean/min/max/count of its non-null members. One hash aggregation
    keyed on the block ids — the standard overview/pyramid step, and
    the shuffle is 1/factor² of the input rows.

    Integer block ids via ``div`` (exact — no float quotient,
    ROUND_NOTES.md #7)."""
    return (
        cells.groupBy(
            "dataset",
            "temporal",
            F.expr(f"cell_y div {int(factor)}").alias("block_y"),
            F.expr(f"cell_x div {int(factor)}").alias("block_x"),
        )
        .agg(
            F.count(value).alias("n_cells"),
            F.avg(value).alias("mean_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
    )


def cell_trend(
    cells: DataFrame,
    value: str = "value",
    temporal_int: str = "t",
) -> DataFrame:
    """Per-cell linear trend across a raster time series (the
    reference's temporal-step datasets, e.g. precipitation per year:
    request_tools.py:454-476 expands one item per temporal file; this
    operator summarizes the stack).

    Least-squares slope/intercept per (cell_y, cell_x) in ONE hash
    aggregation using the exact-moment discipline (ROUND_NOTES.md #8):
    Σt, Σv, Σtv, Σt² accumulate order-free; slope =
    (nΣtv − ΣtΣv) / (nΣt² − (Σt)²) is then a fixed op sequence on
    identical operands in every engine. Null values drop out of the
    fit (their t doesn't count)."""
    t = F.col(temporal_int).cast("double")
    v = F.col(value)
    tv = F.when(v.isNotNull(), t)
    out = cells.groupBy("cell_y", "cell_x").agg(
        F.count(v).alias("n"),
        F.sum(tv).alias("st"),
        F.sum(v).alias("sv"),
        F.sum(t * v).alias("stv"),
        F.sum(tv * tv).alias("stt"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("stt") - F.col("st") * F.col("st")
    slope = (n * F.col("stv") - F.col("st") * F.col("sv")) / denom
    intercept = (F.col("sv") - slope * F.col("st")) / n
    return out.select(
        "cell_y",
        "cell_x",
        "n",
        F.when(denom != 0, slope).alias("slope"),
        F.when(denom != 0, intercept).alias("intercept"),
    )


def synthetic_raster(
    spark: SparkSession,
    dataset: str,
    temporal: str,
    width: int = 100,
    height: int = 100,
) -> DataFrame:
    """Deterministic schema-compatible raster: value = f(x, y). Built
    with ``range``+arithmetic — distributed, no Python."""
    n = width * height
    return (
        spark.range(n)
        .select(
            F.lit(dataset).alias("dataset"),
            F.lit(temporal).alias("temporal"),
            (F.col("id") / width).cast("long").alias("cell_y"),
            (F.col("id") % width).cast("long").alias("cell_x"),
        )
        .withColumn(
            "value",
            (
                F.sin(F.col("cell_x") / 10.0) * 50.0
                + F.cos(F.col("cell_y") / 10.0) * 50.0
            ),
        )
    )
