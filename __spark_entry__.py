"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Query inventory maps SURVEY.md §2 operators onto the driver's testdata
tables. The zonal-statistics vocabulary (§2.4) runs over a synthetic
cell table derived deterministically from ``lineitem`` — the derivation
uses integer-valued measures and power-of-two coverage fractions so
float aggregation is order-independent and hash-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from det_module_spark.operators.extract_types import zonal_extract
from det_module_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# The synthetic zonal cell table (stands in for raster-cells-joined-to-
# boundary-features, SURVEY.md J2/§2.4):
#   asdf_id  — boundary feature id (bounded cardinality, like real zones)
#   value    — cell value, integer-valued double (exact float sums)
#   coverage — pixel coverage fraction in (0,1], eighths (exact sums)
#   potential— 'potential' surface value for the reliability triple
#   category — categorical raster band
# ---------------------------------------------------------------------------

CELLS_SQL = """
WITH cells AS (
  SELECT
    l_orderkey % 200                        AS asdf_id,
    ROUND(l_extendedprice, 0)               AS value,
    CAST(l_linenumber AS DOUBLE) / 8.0      AS coverage,
    ROUND(l_extendedprice * (1 + l_tax), 0) AS potential,
    l_returnflag                            AS category
  FROM lineitem
)
"""

CATEGORIES = ["A", "N", "R"]


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 200).alias("asdf_id"),
        F.round(F.col("l_extendedprice"), 0).alias("value"),
        (F.col("l_linenumber").cast("double") / F.lit(8.0)).alias("coverage"),
        F.round(F.col("l_extendedprice") * (1 + F.col("l_tax")), 0).alias(
            "potential"
        ),
        F.col("l_returnflag").alias("category"),
    )


def _zonal(extract_type: str, round_to: int | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = zonal_extract(
            _cells(spark, sf_dir), extract_type, categories=CATEGORIES
        )
        if round_to is not None:
            val_cols = [c for c in out.columns if c != "asdf_id"]
            out = out.select(
                "asdf_id",
                *[F.round(F.col(f"`{c}`"), round_to).alias(c) for c in val_cols],
            )
        return out

    return q


def _zonal_sql(agg_exprs: str) -> str:
    return f"{CELLS_SQL} SELECT asdf_id, {agg_exprs} FROM cells GROUP BY asdf_id"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reliability zonal extract (the aid-data triple) at
    sf0.001; driver checks rows>0."""
    return _zonal("reliability")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- §2.4 active extract types ---
        "zonal_mean": _zonal("mean"),
        "zonal_count": _zonal("count"),
        "zonal_sum": _zonal("sum"),
        "zonal_min": _zonal("min"),
        "zonal_max": _zonal("max"),
        "zonal_weighted_mean": _zonal("weighted_mean"),
        "zonal_weighted_count": _zonal("weighted_count"),
        "zonal_weighted_sum": _zonal("weighted_sum"),
        "zonal_categorical": _zonal("categorical"),
        "zonal_reliability": _zonal("reliability"),
        # --- §2.4 roadmap extract types ---
        "zonal_std": _zonal("std", round_to=4),
        "zonal_median": _zonal("median"),
        "zonal_majority": _zonal("majority"),
        "zonal_minority": _zonal("minority"),
        "zonal_unique": _zonal("unique"),
        "zonal_range": _zonal("range"),
        "zonal_percentile_25": _zonal("percentile_25"),
        "zonal_var": _zonal("var", round_to=2),
        "zonal_mode": _zonal("mode"),
    }


def oracle_sql() -> dict[str, str]:
    freq_sql = (
        CELLS_SQL
        + """, counts AS (
  SELECT asdf_id, value, COUNT(*) AS cnt FROM cells
  WHERE value IS NOT NULL GROUP BY asdf_id, value
)
SELECT asdf_id, value AS exfield_0 FROM counts
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY asdf_id ORDER BY cnt {dir}, value ASC) = 1
"""
    )
    return {
        "zonal_mean": _zonal_sql("AVG(value) AS exfield_0"),
        "zonal_count": _zonal_sql("COUNT(value) AS exfield_0"),
        "zonal_sum": _zonal_sql("SUM(value) AS exfield_0"),
        "zonal_min": _zonal_sql("MIN(value) AS exfield_0"),
        "zonal_max": _zonal_sql("MAX(value) AS exfield_0"),
        "zonal_weighted_mean": _zonal_sql(
            "SUM(value * coverage) / SUM(coverage) AS exfield_0"
        ),
        "zonal_weighted_count": _zonal_sql("SUM(coverage) AS exfield_0"),
        "zonal_weighted_sum": _zonal_sql("SUM(value * coverage) AS exfield_0"),
        "zonal_categorical": _zonal_sql(
            ", ".join(
                f"COUNT(*) FILTER (WHERE category = '{c}') AS \"exfield_{c}\""
                for c in CATEGORIES
            )
        ),
        "zonal_reliability": _zonal_sql(
            "SUM(value) AS exfield_sum, SUM(potential) AS exfield_potential, "
            "SUM(value) / SUM(potential) AS exfield_reliability"
        ),
        "zonal_std": _zonal_sql("ROUND(STDDEV_SAMP(value), 4) AS exfield_0"),
        "zonal_median": _zonal_sql("MEDIAN(value) AS exfield_0"),
        "zonal_majority": freq_sql.format(dir="DESC"),
        "zonal_minority": freq_sql.format(dir="ASC"),
        "zonal_unique": _zonal_sql("COUNT(DISTINCT value) AS exfield_0"),
        "zonal_range": _zonal_sql("MAX(value) - MIN(value) AS exfield_0"),
        "zonal_percentile_25": _zonal_sql(
            "QUANTILE_CONT(value, 0.25) AS exfield_0"
        ),
        "zonal_var": _zonal_sql("ROUND(VAR_SAMP(value), 2) AS exfield_0"),
        "zonal_mode": freq_sql.format(dir="DESC"),
    }
