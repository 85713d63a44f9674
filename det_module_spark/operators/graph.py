"""Iterative graph operators: connected components for dedup clusters.

Near-duplicate detection produces *pairs*; deduplication needs
*clusters* (every doc labeled with its group's canonical id). That is
connected components — inherently iterative, the one algorithm in this
engine that a single SQL statement can't express (the oracle uses a
recursive CTE).

Implementation: large-star/small-star-style min-label propagation.
Each round every node adopts the minimum label in its neighborhood;
fixpoint in O(diameter) rounds (near-dup clusters are shallow — pairs
chain through shared shingles, diameters of 2-5 are typical, so 3-6
shuffle rounds).

Scale notes: each round is one join + one aggregation on the edge
list. Labels are checkpointed (``localCheckpoint``) every round to cut
the growing lineage — without it the plan doubles per iteration and
the driver OOMs on plan serialization long before data is a problem.
Convergence is detected with a count of changed labels (a scalar per
round, not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Edge list → (id, component) with component = min node id in the
    connected component. Isolated endpoints of self-loops are fine;
    nodes absent from the edge list are absent from the output (join
    the full vertex set afterwards if singletons need labels)."""
    # undirected: symmetrize once
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → (id, cluster, is_canonical). With ``all_ids``
    given, singleton documents get their own cluster label, making the
    output a total dedup assignment: keep rows where is_canonical."""
    comp = connected_components(pairs, src, dst)
    if all_ids is not None:
        ids = all_ids.select(F.col(id_col).alias("id")).distinct()
        comp = (
            ids.join(comp, "id", "left")
            .select(
                "id", F.coalesce("component", F.col("id")).alias("component")
            )
        )
    return comp.select(
        F.col("id"),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
