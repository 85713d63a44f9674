"""Item-item collaborative filtering: co-occurrence cosine neighbors.

The classic "users who touched X also touched Y" recommender and a
useful curation diagnostic (which content items co-travel). For items
i, j with user sets U_i, U_j the association is the cosine of the
binary incidence vectors:

    cos(i, j) = |U_i ∩ U_j| / sqrt(|U_i| · |U_j|)

Scale design — the same fan-out discipline as adamic_adar
(graph.py): the pair generation is a per-user self-join, whose cost
is Σ_u k_u². A power user with 10⁵ items would contribute 10¹⁰ pairs,
so the operator CAPS each user's item set at ``max_items_per_user``
(deterministic md5-rank selection, so the kept subset is stable
across runs and partitionings). The cap is the documented quadratic-
fanout bound: work is ≤ |users| · cap², linear in users. Item counts
|U_i| are computed over the SAME capped incidence so the cosine stays
internally consistent.

Everything is exact int64 until the one IEEE sqrt/divide per pair
(deterministic across engines); ties in the top-k rank break on the
neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_item_cf(
    df: DataFrame,
    user: str,
    item: str,
    k: int = 5,
    max_items_per_user: int = 50,
) -> DataFrame:
    """Top-``k`` cosine neighbors per item from (user, item)
    interactions → (item_a, item_b, n_both, n_a, n_b, cos_ppm, rk).

    One distinct agg → per-user cap window → per-user self-join
    (equi-join on the user key, never a cross join) → pair/item count
    aggs → per-item rank window.
    """
    from pyspark.sql import Window

    inc = df.select(
        F.col(user).alias("u"), F.col(item).cast("string").alias("i")
    ).distinct()
    wcap = Window.partitionBy("u").orderBy(F.md5(F.col("i")), F.col("i"))
    # materialized once (optimization r10): the capped incidence feeds
    # THREE consumers (item counts + both self-join sides) and the
    # distinct + cap window replanned per consumer (guide §2.4)
    capped = (
        inc.withColumn("_r", F.row_number().over(wcap))
        .where(F.col("_r") <= max_items_per_user)
        .drop("_r")
        .localCheckpoint(eager=True)
    )
    item_n = capped.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, "u")
        .where(F.col("a.i") < F.col("b.i"))
        .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    # orient both directions so every item ranks its own neighbors —
    # explode-both-directions in ONE pass (optimization r10): a
    # union's branches are planned independently, so the old shape ran
    # the per-user self-join + pair aggregation twice (guide §2.4)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias("ia"),
                    F.col("ib").alias("ib"),
                    F.col("n_both").alias("n_both"),
                ),
                F.struct(
                    F.col("ib").alias("ia"),
                    F.col("ia").alias("ib"),
                    F.col("n_both").alias("n_both"),
                ),
            )
        ).alias("e")
    ).select("e.ia", "e.ib", "e.n_both")
    scored = (
        sym.join(item_n.withColumnRenamed("i", "ia"), "ia")
        .withColumnRenamed("n", "n_a")
        .join(item_n.withColumnRenamed("i", "ib"), "ib")
        .withColumnRenamed("n", "n_b")
        .withColumn(
            "cos_ppm",
            F.floor(
                F.lit(1000000.0)
                * F.col("n_both").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    wrank = Window.partitionBy("ia").orderBy(
        F.col("cos_ppm").desc(), F.col("ib")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") <= k)
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            "n_both",
            "n_a",
            "n_b",
            "cos_ppm",
            "rk",
        )
    )
