"""Vector boundary source (SURVEY.md S10): GeoJSON → feature DataFrame.

Boundary datasets are feature collections with geometry + attributes;
``asdf_id`` is the unique per-feature key (templates/column_info.txt:2).
The engine's model keeps geometry as WKT-ish strings / bbox columns:

- GeoJSON parses with ``spark.read.json`` + ``explode(features)`` —
  no geo library needed;
- the bbox (minx/miny/maxx/maxy) is computed from raw coordinate
  arrays with higher-order functions, which is all the grid-bucketed
  spatial join (operators/spatial.py) needs for rectangles and for
  the bucketing stage of general polygons;
- exact polygon refinement (shapely) stays in spatial.spatial_join_wkt
  behind its import-try.

Boundary tables are small (10²–10⁵ features) — always the broadcast
side of the zonal join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson_boundaries(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection → one row per feature with asdf_id, attribute
    columns (``prop_*``), and bbox columns derived from the geometry
    coordinates."""
    raw = spark.read.option("multiLine", True).json(path)
    feats = raw.select(F.posexplode("features").alias("asdf_id", "feature"))
    lons, lats = _flatten_coords(F.col("feature.geometry.coordinates"))
    return feats.select(
        "asdf_id",
        F.col("feature.geometry.type").alias("geom_type"),
        F.col("feature.properties").alias("properties"),
        F.array_min(lons).alias("minx"),
        F.array_min(lats).alias("miny"),
        F.array_max(lons).alias("maxx"),
        F.array_max(lats).alias("maxy"),
    )


def _flatten_coords(coords):
    """GeoJSON polygon coordinates ([[ [x,y], ... ]]) → (lons, lats)
    arrays via flatten+transform — pure Column ops."""
    flat = F.flatten(coords)
    lons = F.transform(flat, lambda pt: F.element_at(pt, 1))
    lats = F.transform(flat, lambda pt: F.element_at(pt, 2))
    return lons, lats


def rect_boundaries(
    spark: SparkSession,
    n_x: int = 10,
    n_y: int = 10,
    x0: float = 0.0,
    y0: float = 0.0,
    cell: float = 1.0,
) -> DataFrame:
    """Synthetic non-overlapping rectangle tiling (FIXTURES.md §2):
    n_x × n_y features over [x0, x0+n_x·cell) × [y0, y0+n_y·cell)."""
    return spark.range(n_x * n_y).select(
        F.col("id").cast("int").alias("asdf_id"),
        (x0 + (F.col("id") % n_x) * cell).alias("minx"),
        (y0 + (F.col("id") / n_x).cast("long") * cell).alias("miny"),
        (x0 + (F.col("id") % n_x) * cell + cell).alias("maxx"),
        (y0 + (F.col("id") / n_x).cast("long") * cell + cell).alias("maxy"),
        F.concat(F.lit("feature_"), F.col("id")).alias("NAME_1"),
    )
