"""Fixed-iteration Lloyd k-means over embedding columns — exact
integer arithmetic, so a distributed run hash-matches an unrolled SQL
oracle bit-for-bit.

The LLM-pipeline use is corpus clustering: topic/domain bucketing for
mixture balancing, cluster-based dedup sharding, and the coarse
quantizer behind IVF indexes (similarity.py fits its IVF centroids on
a driver-side sample; this operator is the fully-distributed
counterpart for when the fit itself must scale).

Determinism contract (ROUND_NOTES float rules): embeddings are
quantized once to shifted nonneg ints (``round(x·10⁴) + shift``);
distances are exact int64 sums of squares; centroid updates are
integer floor-division of per-dimension sums (positive, so truncation
== floor on every engine); assignment ties break to the lowest
centroid id via min-struct. A fixed iteration count then yields
identical assignments on any engine, partitioning, or thread count.
Initial centroids are the vectors with ``id < k`` — deterministic
seeding that assumes ids start at 0 (the driver tables' contract);
an id space that skips [0, k) seeds fewer than k clusters (and an
id space disjoint from [0, k) yields an EMPTY result — the caller
owns the id contract, mirrored in the oracle).

Scale shape per iteration: the exploded points table joins the
centroid table on the DIMENSION key (centroids: k·dims rows, bounded
by the k and dims PARAMETERS — small by construction, AQE broadcasts
it), aggregates (vec, cid) partial distances map-side, takes a
min-struct per vec, and re-aggregates (cid, dim) sums. Two shuffles
per round, both keyed finely enough to spread; no global window, no
driver-side data plane (the centroid frames stay DataFrames).

Materialization (the canonical Lloyd discipline, same as MLlib's
input caching): the quantized points are localCheckpoint-ed ONCE —
every round references them twice (assignment + update) plus the
final assignment, and without the cut Catalyst re-evaluates the
embeddings scan + explode per reference (measured 22 static scans
at iters=2 for what should be one pass). Per-round centroids
(k·dims rows — control-plane-sized) checkpoint too, so lineage
stays flat instead of nesting every previous round's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHIFT = 10_000
_QSCALE = 10_000


def quantize_points(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec<float>) -> exploded (id, dim, q) with q a shifted
    nonnegative int (exact for |x| < shift/qscale = 1.0)."""
    return embeddings.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("dim", "x"),
    ).select(
        id_col,
        "dim",
        (
            F.floor(F.col("x").cast("double") * _QSCALE + F.lit(0.5)).cast(
                "long"
            )
            + F.lit(_SHIFT)
        ).alias("q"),
    )


def _assign(pts: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per vector: (id, cid, distq); ties -> lowest
    cid (min over (dist, cid) structs)."""
    d = (
        pts.join(centroids, "dim")
        .groupBy(id_col, "cid")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias(
                "dist"
            )
        )
    )
    best = F.min(F.struct(F.col("dist"), F.col("cid"))).alias("b")
    return d.groupBy(id_col).agg(best).select(
        id_col,
        F.col("b.cid").alias("cid"),
        F.col("b.dist").alias("distq"),
    )


def kmeans_fit_predict(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds (assign + update) from the first-k
    seed, then a final assignment under the fitted centroids.
    → (id, cid, distq). Clusters that empty out keep their previous
    centroid (coalesce in the update — same rule in the oracle)."""
    pts = quantize_points(embeddings, id_col, vec_col).localCheckpoint(
        eager=True
    )
    centroids = pts.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), "dim", F.col("q").alias("c")
    )
    for _ in range(iters):
        assign = _assign(pts, centroids, id_col)
        upd = (
            assign.select(id_col, "cid")
            .join(pts, id_col)
            .groupBy("cid", "dim")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid",
                "dim",
                F.expr("s div n").alias("c_new"),
            )
        )
        centroids = (
            centroids.join(upd, ["cid", "dim"], "left")
            .select(
                "cid", "dim", F.coalesce("c_new", F.col("c")).alias("c")
            )
            .localCheckpoint(eager=True)
        )
    return _assign(pts, centroids, id_col)


def kmeans_sql(
    k: int = 8,
    iters: int = 2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The identical fit as one unrolled-CTE SQL statement for the
    DuckDB oracle. Dimension indexes differ (1-based vs 0-based) but
    are internal join keys only — never emitted."""
    sql = f"""
WITH pts AS (
  SELECT {id_col}, CAST(generate_subscripts({vec_col}, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest({vec_col}) AS DOUBLE) * {_QSCALE} + 0.5)
              AS BIGINT) + {_SHIFT} AS q
  FROM {table}),
c0 AS (SELECT {id_col} AS cid, dim, q AS c FROM pts WHERE {id_col} < {k})"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
a{i} AS (
  SELECT {id_col}, cid, dist FROM (
    SELECT p.{id_col}, m.cid,
           SUM((p.q - m.c) * (p.q - m.c)) AS dist
    FROM pts p JOIN {prev} m USING (dim)
    GROUP BY p.{id_col}, m.cid)
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY {id_col} ORDER BY dist, cid) = 1),
u{i} AS (
  SELECT a.cid, p.dim,
         CAST(SUM(p.q) AS BIGINT) // COUNT(*) AS c_new
  FROM a{i} a JOIN pts p USING ({id_col})
  GROUP BY a.cid, p.dim),
c{i} AS (
  SELECT m.cid, m.dim, COALESCE(u.c_new, m.c) AS c
  FROM {prev} m LEFT JOIN u{i} u
    ON u.cid = m.cid AND u.dim = m.dim)"""
        prev = f"c{i}"
    return sql + f"""
SELECT {id_col}, cid, CAST(dist AS BIGINT) AS distq FROM (
  SELECT p.{id_col}, m.cid,
         SUM((p.q - m.c) * (p.q - m.c)) AS dist
  FROM pts p JOIN {prev} m USING (dim)
  GROUP BY p.{id_col}, m.cid)
QUALIFY ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY dist, cid) = 1"""
