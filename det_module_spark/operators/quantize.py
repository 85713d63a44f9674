"""Scalar (int8) embedding quantization — vector-store compression.

Production vector stores ship embeddings as uint8 codes (4× smaller
than float32, 8× than float64) with a per-dimension affine codebook;
this module fits that codebook over the corpus and reports per-vector
reconstruction error, the audit a pipeline runs before switching its
ANN index to quantized storage. Complements the trained-codebook PQ
path (similarity.py): SQ8 needs no training pass, only per-dim
min/max.

Determinism/parity: the inputs are float32 values widened to float64
(exact), min/max are selections (no accumulation), and the per-dim
affine map + squared error use only IEEE ×,/,−,+ on exact operands in
a FIXED association order mirrored in the SQL oracle; each per-dim
error term is quantized to int64 BEFORE the per-vector sum, so totals
are order-independent and hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sq8_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    err_scale: int = 10**12,
) -> DataFrame:
    """Fit a per-dimension [min, max] → {0..255} codebook over the
    corpus and score every vector's reconstruction:
    → (id, code_sum, err_q) with code_sum = Σ_d code and err_q =
    Σ_d floor((dequant_d − x_d)² · err_scale + 0.5), both int64.

    code = round(255·(x − mn)/(mx − mn)); a constant dimension
    (mx == mn) codes to 0 and reconstructs exactly. The codebook
    table has exactly ``dim`` rows — a schema constant, not a
    corpus-sized frame — so the join back is broadcast-sized at any
    corpus scale (left to AQE, no forced hint). Everything else is
    one posexplode + two hash aggs: linear, JVM-side, no UDFs.
    """
    dims = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "xf"),
    ).select("id", "dim", F.col("xf").cast("double").alias("x"))
    book = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = dims.join(book, "dim")
    span = F.col("mx") - F.col("mn")
    code = F.when(
        span > 0,
        F.floor((F.col("x") - F.col("mn")) / span * F.lit(255.0) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    coded = j.select("id", "x", "mn", span.alias("span"), code.alias("code"))
    # dequant = mn + code*span/255  (association order pinned: (code*span)/255)
    dq = F.col("mn") + F.col("code").cast("double") * F.col("span") / F.lit(
        255.0
    )
    e = dq - F.col("x")
    term_q = F.floor(e * e * F.lit(float(err_scale)) + F.lit(0.5)).cast("long")
    return coded.select("id", "code", term_q.alias("tq")).groupBy("id").agg(
        F.sum("code").alias("code_sum"), F.sum("tq").alias("err_q")
    )


def sq8_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    err_scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`sq8_quantize` (same association order;
    list indexing over a ``range(dim)`` frame replaces posexplode)."""
    return f"""
WITH dims AS (
  SELECT {id_col} AS id, CAST(t.d AS INTEGER) AS dim,
         CAST({vec_col}[CAST(t.d + 1 AS INTEGER)] AS DOUBLE) AS x
  FROM {table}, range({dim}) t(d)),
book AS MATERIALIZED (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY dim),
coded AS (
  SELECT id, x, mn, mx - mn AS span,
         CASE WHEN mx - mn > 0
              THEN CAST(FLOOR((x - mn) / (mx - mn) * 255.0 + 0.5) AS BIGINT)
              ELSE 0 END AS code
  FROM dims JOIN book USING (dim)),
terms AS (
  SELECT id, code,
         CAST(FLOOR((mn + CAST(code AS DOUBLE) * span / 255.0 - x)
                    * (mn + CAST(code AS DOUBLE) * span / 255.0 - x)
                    * {float(err_scale)} + 0.5) AS BIGINT) AS tq
  FROM coded)
SELECT id AS {id_col}, CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(SUM(tq) AS BIGINT) AS err_q
FROM terms GROUP BY id"""
