"""Maximal Marginal Relevance (MMR) diversified top-k selection.

Plain top-k by relevance returns near-duplicates; RAG context
assembly and eval-set curation want the classic MMR greedy instead:
repeatedly pick the candidate maximizing
``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)``.

Determinism contract (what makes the SQL oracle hash-match): vector
components are quantized to integers (``floor(v·1024 + 0.5)``, the
``similarity.VEC_QUANT`` convention) so relevance and pairwise
similarity are exact int64 dot products, λ is fixed at 0.5 and the
objective scaled by 2 (``rel − max sim``, still integer), and every
argmax breaks ties by ascending candidate id.

Scale shape: the candidate pool is top-``pool`` by relevance per
query (one bounded window per query partition), so the greedy runs on
≤ pool rows per group — ``applyInPandas`` with an O(k·pool²) int64
kernel per query group is bounded work per key, independent of corpus
size. The corpus-side relevance scan is one pass: corpus ⋈ broadcast
queries (the query frame is the bounded side by contract, same as
``similarity.cosine_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUANT = 1024


def quantize_vec(col):
    """Quantized int64 copy of a float vector column."""
    return F.transform(
        col,
        lambda v: F.floor(v.cast("double") * QUANT + F.lit(0.5)).cast(
            "long"
        ),
    )


def int_dot(a, b):
    """Exact int64 dot product of two quantized vector columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def mmr_select(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    pool: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, sel_rank, vec_id, mmr_score): the ``k`` MMR
    selections per query from the top-``pool`` relevance candidates.
    ``mmr_score`` is the scaled integer objective at selection time
    (= relevance for the first pick, rel − max-sim-to-selected after).
    """
    # NULL embeddings are excluded up front (the similarity kernels'
    # NULL-on-NULL contract): a null vector would otherwise produce a
    # null relevance — which desc-sorts LAST and could still enter an
    # underfull pool, then crash the int64 greedy kernel on a None.
    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), quantize_vec(F.col(vec_col)).alias("qv")
    )
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("cand_id"), quantize_vec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .withColumn("rel", int_dot(F.col("qv"), F.col("cv")))
        .drop("qv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("cand_id")
    )
    cand = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= pool)
        .drop("__rn")
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("sel_rank", T.IntegerType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("mmr_score", T.LongType()),
        ]
    )

    def greedy(pdf):
        import pandas as pd

        pdf = pdf.sort_values("cand_id").reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        rows = [
            (qid, rank, vid, score)
            for rank, vid, score in greedy_kernel(
                pdf["cand_id"].tolist(),
                pdf["rel"].tolist(),
                list(pdf["cv"]),
                k,
            )
        ]
        return pd.DataFrame(
            rows, columns=["query_id", "sel_rank", "vec_id", "mmr_score"]
        )

    return cand.groupBy("query_id").applyInPandas(greedy, out_schema)


def greedy_kernel(ids, rel, vecs, k):
    """The per-group MMR greedy over PRE-SORTED-by-id candidates:
    → [(sel_rank, id, score)]. Exact int64 numpy; module-level so the
    property suite can drive it against a reference implementation."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    mat = np.asarray(list(vecs), dtype=np.int64)
    sim = mat @ mat.T  # exact int64
    n = len(ids)
    selected: list[int] = []
    out = []
    for rank in range(1, min(k, n) + 1):
        if selected:
            maxsim = sim[:, selected].max(axis=1)
            score = rel - maxsim
        else:
            score = rel.copy()
        score[selected] = np.iinfo(np.int64).min
        # argmax with id-asc tie-break: ids are sorted, so the first
        # maximal position is the smallest id
        best = int(np.argmax(score))
        out.append((rank, int(ids[best]), int(score[best])))
        selected.append(best)
    return out


def _sql_qdot(a: str, b: str, dim: int) -> str:
    qa = f"CAST(floor(CAST({a}[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)"
    qb = f"CAST(floor(CAST({b}[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)"
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> {qa} * {qb}))"
    )


def mmr_sql(
    queries_pred: str, k: int = 4, pool: int = 12, dim: int = 64
) -> str:
    """The identical greedy as one SQL statement (unrolled selection
    steps) for the DuckDB oracle. ``queries_pred`` is the WHERE
    predicate choosing query vectors from ``embeddings``."""
    rel = _sql_qdot("q.embedding", "c.embedding", dim)
    sim = _sql_qdot("a.cv", "b.cv", dim)
    sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           WHERE {queries_pred}),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id, c.embedding AS cv,
         CAST({rel} AS BIGINT) AS rel
  FROM embeddings c, q WHERE q.query_id <> c.vec_id),
cand AS MATERIALIZED (
  SELECT query_id, cand_id, cv, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rel DESC, cand_id ASC) AS rn
    FROM scored) WHERE rn <= {pool}),
sims AS MATERIALIZED (
  SELECT a.query_id, a.cand_id AS ia, b.cand_id AS ib,
         CAST({sim} AS BIGINT) AS sim
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
s1 AS (
  SELECT query_id, cand_id, rel AS score FROM (
    SELECT query_id, cand_id, rel, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, cand_id ASC) AS rn
    FROM cand) WHERE rn = 1),
sel1 AS (SELECT query_id, cand_id FROM s1)"""
    prev_sel = "sel1"
    for step in range(2, k + 1):
        sql += f""",
m{step} AS (
  SELECT c.query_id, c.cand_id,
         c.rel - MAX(s.sim) AS score
  FROM cand c
  JOIN sims s ON s.query_id = c.query_id AND s.ia = c.cand_id
  JOIN {prev_sel} p ON p.query_id = s.query_id AND p.cand_id = s.ib
  WHERE NOT EXISTS (SELECT 1 FROM {prev_sel} x
                    WHERE x.query_id = c.query_id
                      AND x.cand_id = c.cand_id)
  GROUP BY c.query_id, c.cand_id, c.rel),
s{step} AS (
  SELECT query_id, cand_id, score FROM (
    SELECT query_id, cand_id, score, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, cand_id ASC) AS rn
    FROM m{step}) WHERE rn = 1),
sel{step} AS MATERIALIZED (SELECT query_id, cand_id FROM {prev_sel}
              UNION ALL SELECT query_id, cand_id FROM s{step})"""
        prev_sel = f"sel{step}"
    picks = " UNION ALL ".join(
        f"SELECT query_id, {i} AS sel_rank, cand_id, score FROM s{i}"
        for i in range(1, k + 1)
    )
    return (
        sql
        + f"""
SELECT query_id, CAST(sel_rank AS INT) AS sel_rank,
       cand_id AS vec_id, CAST(score AS BIGINT) AS mmr_score
FROM ({picks})"""
    )
