"""Geometry kernels as pure Column expressions — no geo libraries.

Two kernels the zonal pipeline needs that Catalyst lacks, both
expressed with higher-order array functions so they run inside the
JVM (no Python, no shapely):

- ``point_in_polygon``: even-odd ray casting over a polygon given as
  ``array<struct<x:double, y:double>>`` (closed or open ring). The
  edge sweep is ``zip_with(ring, rotated_ring)`` + ``filter`` +
  ``size`` — O(vertices) per point, vectorized by codegen. This is
  the exact-refinement step of the bucketed spatial join for real
  polygons; shapely (spatial.spatial_join_wkt) remains an optional
  fast path for huge rings.
- ``rect_coverage_fraction``: the fraction of a grid cell's area
  covered by an axis-aligned boundary rectangle — the coverage weight
  feeding the ``weighted_*`` extract types (SURVEY.md hard-list (b)).
  Exact for rectangle tilings; general polygons get coverage by
  supersampling points through ``point_in_polygon``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ring_edges(ring: Column) -> Column:
    """array<struct<a, b>> of polygon edges: vertex i paired with
    vertex i+1 (wrapping) — ``zip_with`` against the rotated ring."""
    n = F.size(ring)
    rotated = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    return F.zip_with(
        ring, rotated, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
    )


def point_in_polygon(x: Column, y: Column, ring: Column) -> Column:
    """Even-odd ray casting: count edges crossing the horizontal ray
    from (x, y) to +∞; odd ⇒ inside. Half-open vertex rule
    ((ay > y) != (by > y)) counts each vertex once, so points aligned
    with vertices don't double-count."""
    edges = ring_edges(ring)

    def crosses(e: Column) -> Column:
        ax, ay = e["a"]["x"], e["a"]["y"]
        bx, by = e["b"]["x"], e["b"]["y"]
        straddles = (ay > y) != (by > y)
        x_at_y = ax + (y - ay) / (by - ay) * (bx - ax)
        return straddles & (x < x_at_y)

    return F.size(F.filter(edges, crosses)) % 2 == 1


def rect_coverage_fraction(
    cell_minx: Column,
    cell_miny: Column,
    cell_size: Column,
    minx: Column,
    miny: Column,
    maxx: Column,
    maxy: Column,
) -> Column:
    """Area fraction of the cell [cell_minx, +size)×[cell_miny, +size)
    covered by the rectangle [minx,maxx)×[miny,maxy). Pure arithmetic:
    clip each axis, multiply, normalize."""
    ox = F.greatest(
        F.least(cell_minx + cell_size, maxx) - F.greatest(cell_minx, minx),
        F.lit(0.0),
    )
    oy = F.greatest(
        F.least(cell_miny + cell_size, maxy) - F.greatest(cell_miny, miny),
        F.lit(0.0),
    )
    return ox * oy / (cell_size * cell_size)
