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

rasterio is not bundled in this container: the decode kernel raises
``NotImplementedError`` unless available, and ``synthetic_raster``
provides a deterministic stand-in with the identical output schema so
every downstream operator is testable.
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
    become null values. Requires rasterio.
    """
    try:  # pragma: no cover - geo stack not bundled in this container
        import rasterio  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "GeoTIFF decoding needs rasterio; use synthetic_raster for "
            "schema-compatible test cells"
        ) from e

    inventory = spark.createDataFrame(files, schema=FILE_SCHEMA)
    # one task per file; window tiling happens inside the kernel
    inventory = inventory.repartition(max(len(files), 1))

    def decode(batches: Iterator) -> Iterator:  # pragma: no cover
        import numpy as np
        import pandas as pd
        import rasterio
        from rasterio.windows import Window

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with rasterio.open(row.path) as src:
                    nodata = src.nodata
                    for y0 in range(0, src.height, tile_size):
                        for x0 in range(0, src.width, tile_size):
                            win = Window(
                                x0, y0,
                                min(tile_size, src.width - x0),
                                min(tile_size, src.height - y0),
                            )
                            arr = src.read(band, window=win).astype("float64")
                            ys, xs = np.nonzero(np.ones_like(arr))
                            vals = arr[ys, xs]
                            if nodata is not None:
                                vals = np.where(vals == nodata, np.nan, vals)
                            yield pd.DataFrame(
                                {
                                    "dataset": row.dataset,
                                    "temporal": row.temporal,
                                    "cell_y": ys + y0,
                                    "cell_x": xs + x0,
                                    "value": vals,
                                }
                            )

    return inventory.mapInPandas(decode, schema=CELL_SCHEMA)


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
