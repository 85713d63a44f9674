"""Count-min sketch: sub-linear frequency estimation (heavy hitters).

At 100 TB an exact per-key count of a high-cardinality column is a
full shuffle of every key; a count-min sketch reduces it to a
fixed-size (depth × width) counter table that is MERGEABLE (counters
add), so partial sketches combine map-side and the reduce state is
bounded by d·w regardless of input size — the same
sketch-replaces-shuffle argument as approx_stats' HLL.

The row hashes are an engine-portable splitmix-style integer mix
(multiply by a 32-bit odd constant, xor-shift, mod width) — all exact
int64 arithmetic on bounded inputs, so Spark and the DuckDB oracle
compute IDENTICAL sketches and estimates: the approximation error is
deterministic for a fixed dataset, which makes the whole pipeline
value-checkable (cf. ROUND_NOTES.md playbook #10).

Estimate(v) = min over rows i of counter[i][h_i(v)] — the classic CM
upper bound: never under-counts, over-counts only via collisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (32-bit odd) — products of
#: |v + seed| < 2^31 inputs stay far below 2^63 (no ANSI overflow)
_MULT = 2654435761


def _bucket(v: Column, row: int, width: int) -> Column:
    """Deterministic bucket of ``v`` for hash row ``row``: multiply,
    xor-shift, mod. Pure int64 Column ops; bit-identical in ANSI SQL
    ((x * c) # (x * c) >> 13) % w with DuckDB's xor()."""
    x = (v + F.lit(row * 1_000_003 + 1)) * F.lit(_MULT)
    mixed = x.bitwiseXOR(F.shiftright(x, 13))
    return mixed % F.lit(width)


def cms_sketch(
    df: DataFrame, col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Build the (depth × width) counter table: each input row feeds
    one counter per hash row. The explode is a map-side fan-out of
    ``depth``; partial aggregation collapses it to ≤ depth·width rows
    per partition before the (tiny, bounded) shuffle."""
    v = F.col(col).cast("long")
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("hrow"), _bucket(v, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.hrow").alias("hrow"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for each candidate value: min over hash
    rows of its counters. The sketch is tiny (≤ depth·width rows) and
    broadcasts; candidates never shuffle."""
    v = F.col(col).cast("long")
    probes = candidates.select(v.alias("value")).distinct()
    probes = probes.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hrow"),
                        _bucket(F.col("value"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select("value", F.col("e.hrow").alias("hrow"), F.col("e.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["hrow", "bucket"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    top: int = 20,
) -> DataFrame:
    """Top-``top`` values by estimated count. Candidates are the
    column's distinct values (bounded in the intended use — ids,
    categories); the sketch bounds the *counting* state, which is
    what explodes at scale. Ties rank by value ascending.

    Top-k shape (VERDICT r02 #2): ``orderBy(...).limit(top)`` compiles
    to TakeOrderedAndProject — a per-partition bounded heap merged on
    the driver, NOT a single-partition global sort (the old
    partition-less ``row_number`` window collapsed every distinct
    value onto one task). Rank is then assigned on the collected ≤
    ``top`` rows: the sort key (est_count desc, value asc) is a total
    order, so the collected order is deterministic and the collect is
    control-plane-bounded by ``top``, never by the data."""
    sk = cms_sketch(df, col, width, depth)
    est = cms_estimate(sk, df, col, width, depth)
    topk = est.orderBy(F.desc("est_count"), F.asc("value")).limit(top)
    rows = [
        (i + 1, r["value"], r["est_count"])
        for i, r in enumerate(topk.collect())
    ]
    return df.sparkSession.createDataFrame(
        rows, "rank INT, value BIGINT, est_count BIGINT"
    )
