"""Column-expression geometry kernels: ray casting + coverage."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from det_module_spark.operators.geometry import (
    point_in_polygon,
    rect_coverage_fraction,
)

RING_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )
)

# concave L-shape: (0,0)-(4,0)-(4,2)-(2,2)-(2,4)-(0,4)
L_SHAPE = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]
TRIANGLE = [(0.0, 0.0), (4.0, 0.0), (2.0, 3.0)]


def _check(spark, ring, cases):
    rows = [Row(x=float(x), y=float(y), expected=e) for x, y, e in cases]
    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType()),
         T.StructField("expected", T.BooleanType())]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "ring",
        F.lit(None).cast(RING_TYPE),
    )
    ring_lit = F.array(
        *[
            F.struct(F.lit(x).alias("x"), F.lit(y).alias("y"))
            for x, y in ring
        ]
    )
    out = df.withColumn("inside", point_in_polygon(F.col("x"), F.col("y"), ring_lit))
    for r in out.collect():
        assert r["inside"] == r["expected"], (r["x"], r["y"])


def test_point_in_concave_polygon(spark):
    _check(
        spark,
        L_SHAPE,
        [
            (1, 1, True),     # lower-left arm
            (3, 1, True),     # lower-right arm
            (1, 3, True),     # upper arm
            (3, 3, False),    # the notch — concavity matters
            (5, 1, False),    # outside right
            (-1, 1, False),   # outside left
            (1, 5, False),    # outside top
        ],
    )


def test_point_in_triangle(spark):
    _check(
        spark,
        TRIANGLE,
        [(2, 1, True), (2, 2.9, True), (0.5, 2, False), (3.5, 2, False)],
    )


def test_rect_coverage_fraction(spark):
    df = spark.createDataFrame(
        [
            # cell fully inside the rect
            Row(cx=1.0, cy=1.0, minx=0.0, miny=0.0, maxx=4.0, maxy=4.0, exp=1.0),
            # half-covered (rect edge bisects the cell)
            Row(cx=3.5, cy=1.0, minx=0.0, miny=0.0, maxx=4.0, maxy=4.0, exp=0.5),
            # quarter-covered corner
            Row(cx=3.5, cy=3.5, minx=0.0, miny=0.0, maxx=4.0, maxy=4.0, exp=0.25),
            # disjoint
            Row(cx=9.0, cy=9.0, minx=0.0, miny=0.0, maxx=4.0, maxy=4.0, exp=0.0),
        ]
    )
    out = df.withColumn(
        "frac",
        rect_coverage_fraction(
            F.col("cx"), F.col("cy"), F.lit(1.0),
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        ),
    )
    for r in out.collect():
        assert abs(r["frac"] - r["exp"]) < 1e-12


def test_coverage_feeds_weighted_zonal(spark):
    """Full weighted pipeline: cells × rect boundaries -> coverage
    weights -> weighted_mean; verified against hand computation."""
    from det_module_spark.operators.extract_types import zonal_extract

    # 2 cells of size 1: one fully inside, one half inside the boundary
    cells = spark.createDataFrame(
        [Row(asdf_id=1, cx=0.0, cy=0.0, value=10.0),
         Row(asdf_id=1, cx=1.5, cy=0.0, value=20.0)]
    )
    # boundary [0, 2) x [0, 1): cell@0 covered 1.0, cell@1.5 covered 0.5
    withw = cells.withColumn(
        "coverage",
        rect_coverage_fraction(
            F.col("cx"), F.col("cy"), F.lit(1.0),
            F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(1.0),
        ),
    )
    out = zonal_extract(withw, "weighted_mean").collect()
    # (10*1 + 20*0.5) / (1 + 0.5) = 20/1.5
    assert abs(out[0]["exfield_0"] - 20.0 / 1.5) < 1e-12


def test_spatial_join_polygon(spark):
    """Bucketed join + ray-cast refinement on a concave boundary."""
    from det_module_spark.operators.spatial import spatial_join_polygon

    ring = F.array(
        *[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in L_SHAPE]
    )
    bounds = spark.createDataFrame(
        [Row(asdf_id=1, minx=0.0, miny=0.0, maxx=4.0, maxy=4.0)]
    ).withColumn("ring", ring)
    points = spark.createDataFrame(
        [Row(pid=0, lon=1.0, lat=1.0),   # inside lower arm
         Row(pid=1, lon=3.0, lat=3.0),   # in the bbox but in the notch
         Row(pid=2, lon=1.0, lat=3.0),   # inside upper arm
         Row(pid=3, lon=5.0, lat=5.0)]   # outside bbox entirely
    )
    got = {r["pid"] for r in spatial_join_polygon(points, bounds).collect()}
    assert got == {0, 2}  # notch point excluded despite bbox-bucket hit
