"""MSR — "mean surface raster" allocation pipeline.

The reference declares the MSR contract (queue/request_tools.py:373-380):
a filtered geocoded-aid ("release") dataset is rasterized to a fixed
0.05° grid (resolution constant queue/request_tools.py:65) producing a
``sum`` surface and a ``potential`` surface
(templates/field_names.txt:15-22); the numeric kernel lives in the
sibling ``mean-surface-rasters`` repo. Semantics re-founded here:

- each project's commitment value is split evenly across its N
  geocoded locations (even-split allocation; aid values are always
  commitments, templates/aid_data.txt:7);
- ``sum`` surface: per grid cell, the sum of allocated values of
  locations falling in the cell;
- ``potential`` surface: the same sum but with the *full* project value
  at every location — "the maximum aid that could have been allocated
  ... regardless of the distribution" (templates/field_names.txt:20-21);
- ``reliability`` = sum ÷ potential (templates/field_names.txt:22).

Physical shape (J3 in SURVEY.md §2.3): location→cell assignment is pure
arithmetic (``floor(lon/res)``), so the whole pipeline is a filter + a
window-free groupBy — two shuffles total (one for the per-project
location count, one for the per-cell sum), no spatial library. The
global grid is ≤ 7200×3600 ≈ 26M cells, so the aggregated surface is
always small; the *input* (project locations) can be arbitrarily large
and only ever flows through hash aggregation.

Year-range filter semantics: a project matches a selected year range if
its [start_year, end_year] interval overlaps it; overlapping project
ranges may double-count across separate selections — documented
reference behavior (templates/aid_data.txt:5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# queue/request_tools.py:65
MSR_RESOLUTION = 0.05


def grid_cell(lon: Column, lat: Column, resolution: float = MSR_RESOLUTION) -> list[Column]:
    """Integer grid-cell coordinates at a fixed resolution — the
    point-in-cell 'join' is this arithmetic, not geometry."""
    return [
        F.floor(lon / F.lit(resolution)).cast("long").alias("cell_x"),
        F.floor(lat / F.lit(resolution)).cast("long").alias("cell_y"),
    ]


def apply_release_filters(
    locations: DataFrame,
    donors: list[str] | None = None,
    sectors: list[str] | None = None,
    years: tuple[int, int] | None = None,
    commitments: tuple[float, float] | None = None,
) -> DataFrame:
    """The declared aid-dataset filter vocabulary (doc_test.py:24-47,
    request_tools.py:352-359): donors / ad_sector_names membership,
    year-range overlap, total_commitments range. All native predicates →
    pushed to the parquet scan by Catalyst."""
    df = locations
    if donors:
        df = df.filter(F.col("donors").isin(donors))
    if sectors:
        df = df.filter(F.col("ad_sector_names").isin(sectors))
    if years:
        lo, hi = years
        # interval overlap, not containment (templates/aid_data.txt:5)
        df = df.filter(
            (F.col("start_year") <= F.lit(hi)) & (F.col("end_year") >= F.lit(lo))
        )
    if commitments:
        lo, hi = commitments
        df = df.filter(F.col("total_commitments").between(lo, hi))
    return df


def even_split_allocation(
    locations: DataFrame,
    project_key: str = "project_id",
    value: str = "total_commitments",
) -> DataFrame:
    """value ÷ n_locations per location. The location count is a
    per-project aggregate joined back. No broadcast hint: the count
    table is corpus-derived (one row per project, grows with the
    input), so a forced broadcast is an executor OOM at some scale —
    un-hinted, AQE broadcasts it while it measures small and falls
    back to a shuffle join when it doesn't (VERDICT r03 #3, the same
    rule as every other corpus-derived build side in the repo)."""
    counts = locations.groupBy(project_key).agg(
        F.count(F.lit(1)).alias("n_locations")
    )
    return (
        locations.join(counts, project_key)
        .withColumn("allocated", F.col(value) / F.col("n_locations"))
        .withColumn("potential", F.col(value))
    )


def msr_surface(
    allocated: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    resolution: float = MSR_RESOLUTION,
) -> DataFrame:
    """Rasterize: group allocated locations by grid cell; emit the
    sum / potential / reliability triple per cell."""
    cells = allocated.select(
        *grid_cell(F.col(lon), F.col(lat), resolution),
        F.col("allocated"),
        F.col("potential"),
    )
    return cells.groupBy("cell_x", "cell_y").agg(
        F.sum("allocated").alias("sum"),
        F.sum("potential").alias("potential"),
        (F.sum("allocated") / F.sum("potential")).alias("reliability"),
    )
