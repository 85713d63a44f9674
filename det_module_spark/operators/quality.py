"""Data-quality rule checking: functional dependencies and
dictionary encoding.

The reference trusts its inputs (schemas implied by convention,
SURVEY.md §1.3); a 100 TB warehouse can't. These operators turn two
classic quality/layout tools into single-shuffle dataflows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fd_violations(
    df: DataFrame, lhs: list[str], rhs: str
) -> DataFrame:
    """Audit the functional dependency lhs → rhs: one row per lhs
    tuple with more than one distinct rhs value:
    → (lhs..., n_rows, n_rhs_values). Empty result = FD holds.
    One hash aggregation (count_distinct is a partial-aggregable
    sketchless exact count here — fine for per-group cardinalities;
    swap approx_count_distinct at extreme group counts)."""
    return (
        df.groupBy(*lhs)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(rhs)).alias("n_rhs_values"),
        )
        .filter(F.col("n_rhs_values") > 1)
    )


def dictionary_encode(
    df: DataFrame, col: str, code_col: str = "code"
) -> tuple[DataFrame, DataFrame]:
    """Order-preserving dictionary encoding: → (dictionary, encoded).
    The dictionary maps each distinct value to a dense integer code in
    value order (dense_rank over the DISTINCT values — the window input
    is dictionary-sized, not data-sized); the encoded frame joins the
    dictionary back (broadcast — dictionaries are small by
    definition, else you wouldn't dict-encode)."""
    dictionary = (
        df.select(F.col(col)).distinct()
        .withColumn(
            code_col,
            F.dense_rank().over(Window.partitionBy().orderBy(F.asc(col))),
        )
    )
    encoded = df.join(F.broadcast(dictionary), col).drop(col)
    return dictionary, encoded
