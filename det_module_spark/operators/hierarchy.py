"""Hierarchy flattening: transitive closure / bill-of-materials
explosion over a parent→child edge table.

Spark has no recursive CTE, yet org charts, part hierarchies and
category trees are everyday warehouse shapes. The distributed
equivalent is level-wise frontier extension: the paths of length k+1
are exactly (paths of length k) ⋈ edges, so ``max_depth`` equi-joins
enumerate every ancestor→descendant path of a DAG exactly once — no
cross joins, no driver recursion, early exit when a level comes back
empty.

Semantics (BOM-standard): along a path the per-edge quantities
MULTIPLY (3 sub-assemblies × 4 bolts = 12 bolts), and across multiple
paths between the same (ancestor, descendant) pair they SUM. The
level-wise expansion aggregates per (ancestor, descendant) at every
level, which keeps the level frame at ≤ one row per reachable pair
(sum-of-products distributes over the extension join) — the row count
never tracks the path count, which is what makes a dense DAG safe.

Scale shape per level: one equi-join keyed on the frontier's
descendant + one hash aggregation. The edge table is scanned once per
level; at 1000 executors a 16-deep hierarchy is 16 shuffle rounds of
the (bounded) frontier, not of the corpus. For extremely deep
chain-shaped forests a doubling variant (R ∪ R⋈R, log-depth rounds)
is possible but forest-only — duplicate path decompositions break the
sum-over-paths identity in a DAG — so this module keeps the exact
level-wise form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    parent: str = "parent",
    child: str = "child",
    qty: str | None = None,
    max_depth: int = 16,
) -> DataFrame:
    """Parent→child edges → (ancestor, descendant, depth, ext_qty):
    every ancestor→descendant pair reachable in ≤ ``max_depth`` steps,
    with ``depth`` the path length and ``ext_qty`` the sum over all
    such paths of the product of edge quantities (1 per edge when
    ``qty`` is None). The input must be acyclic — a cycle would make
    the closure infinite; the depth cap bounds the damage but callers
    own the contract.
    """
    q = F.col(qty).cast("long") if qty else F.lit(1).cast("long")
    base = (
        edges.select(
            F.col(parent).alias("ancestor"),
            F.col(child).alias("descendant"),
            q.alias("ext_qty"),
        )
        .groupBy("ancestor", "descendant")
        .agg(F.sum("ext_qty").alias("ext_qty"))
        .withColumn("depth", F.lit(1))
        .select("ancestor", "descendant", "depth", "ext_qty")
        .localCheckpoint(eager=True)
    )
    e = base.select(
        F.col("ancestor").alias("e_parent"),
        F.col("descendant").alias("e_child"),
        F.col("ext_qty").alias("e_qty"),
    )
    out = base
    level = base
    for depth in range(2, max_depth + 1):
        level = (
            level.join(e, level.descendant == F.col("e_parent"))
            .groupBy("ancestor", F.col("e_child").alias("descendant"))
            .agg(F.sum(F.col("ext_qty") * F.col("e_qty")).alias("ext_qty"))
            .withColumn("depth", F.lit(depth))
            .select("ancestor", "descendant", "depth", "ext_qty")
            .localCheckpoint(eager=True)
        )
        if level.isEmpty():
            break
        out = out.unionByName(level)
    return out


def closure_sql(edges_cte: str, max_depth: int = 16) -> str:
    """The identical closure as one recursive-CTE SQL statement for
    the DuckDB oracle. ``edges_cte`` must produce (parent, child, qty).
    The recursion enumerates individual paths (UNION ALL) and the
    outer query folds them with the same sum-over-paths aggregation as
    the level-wise Spark form."""
    return f"""
WITH RECURSIVE edges AS ({edges_cte}),
paths AS (
  SELECT parent AS ancestor, child AS descendant, 1 AS depth,
         CAST(qty AS BIGINT) AS ext_qty
  FROM edges
  UNION ALL
  SELECT p.ancestor, e.child, p.depth + 1, p.ext_qty * e.qty
  FROM paths p JOIN edges e ON p.descendant = e.parent
  WHERE p.depth < {max_depth}
)
SELECT ancestor, descendant, CAST(depth AS INT) AS depth,
       CAST(SUM(ext_qty) AS BIGINT) AS ext_qty
FROM paths GROUP BY ancestor, descendant, depth"""
