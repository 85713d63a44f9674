"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

The bottom-k sketch keeps the k smallest values of a uniform hash of
the keys. It is the simplest of the mergeable distinct sketches:

- **mergeable**: bottom-k of a union = bottom-k of the concatenated
  bottom-k's — so partial sketches combine associatively and the
  reduce state is k longs per group regardless of input size (the
  same sketch-replaces-shuffle argument as the CMS / HLL paths);
- **order- and partition-independent**: min-k of a set does not
  depend on row order, so estimates are identical at any parallelism;
- **deterministic end-to-end**: the hash is the repo's md5-derived
  60-bit ``stable_hash64`` — no RNG, no engine-private hash — so a
  SQL oracle replays the sketch bit-for-bit, *including* its
  estimation error (ROUND_NOTES.md playbook #10 discipline).

Estimator: with h_(k) the k-th smallest of D distinct uniform draws
from [0, 2^60), E[h_(k)] ≈ k/(D+1)·2^60, giving the classic
unbiased-ish KMV estimate  D̂ = (k-1) · 2^60 / h_(k)  (Bar-Yossef et
al. 2002; Beyer et al. 2007 "On synopses for distinct-value
estimation"). Groups with fewer than k distinct hashes are exact
(the "sketch" saw everything).

Scale shape: the per-group sketch is a partitioned window
(``row_number`` over hash within each group — shuffles once on the
group key, never global); the global variant is a distributed
TakeOrdered (``orderBy(h).limit(k)``), the same shape the CMS
heavy-hitter top-k uses. Both avoid the single-partition window
anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from det_module_spark.operators.dedup import stable_hash64

#: hash domain size: stable_hash64 is 15 hex digits = 60 bits
_HASH_DOMAIN = float(1 << 60)


def kmv_estimate(n_seen: Column, kth: Column, k: int) -> Column:
    """D̂ = (k-1)·2^60 / h_(k), exact when the group had < k distinct
    hashes. Double multiply/divide + FLOOR — each an exactly-rounded
    IEEE op on identical operands, so DuckDB reproduces the integer
    result."""
    est = F.floor(
        F.lit(float(k - 1) * _HASH_DOMAIN) / kth.cast("double")
    ).cast("long")
    return F.when(n_seen < F.lit(k), n_seen.cast("long")).otherwise(est)


def kmv_distinct(
    df: DataFrame,
    value: Column,
    k: int = 64,
    by: list[str] | None = None,
) -> DataFrame:
    """Approximate distinct count of ``value`` (optionally per group).

    Returns ``by + [est_distinct]`` (or one row ``[est_distinct]``
    when ``by`` is None). Pair with an exact ``countDistinct`` in
    tests/queries to expose the estimation error — which is itself
    deterministic and oracle-checkable.
    """
    # NULL keys are excluded, not estimated: md5(NULL) is NULL, and a
    # NULL hash would sort FIRST in Spark's window but LAST under
    # DuckDB's default — a silent cross-engine divergence. COUNT
    # DISTINCT semantics ignore NULL anyway.
    df = df.filter(value.isNotNull())
    h = stable_hash64(value.cast("string")).alias("h")
    if by:
        hashes = df.select(*by, h).distinct()
        w = Window.partitionBy(*by).orderBy("h")
        sk = hashes.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
        agg = sk.groupBy(*by).agg(
            F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
        )
        return agg.select(
            *by,
            kmv_estimate(F.col("n_seen"), F.col("kth"), k).alias(
                "est_distinct"
            ),
        )
    hashes = df.select(h).distinct()
    sk = hashes.orderBy("h").limit(k)
    agg = sk.agg(F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth"))
    return agg.select(
        kmv_estimate(F.col("n_seen"), F.col("kth"), k).alias("est_distinct")
    )


def kmv_set_estimates(
    df_a: DataFrame,
    df_b: DataFrame,
    value_a: Column,
    value_b: Column,
    k: int = 64,
) -> DataFrame:
    """KMV sketch ALGEBRA: distinct-count estimates for the union and
    intersection of two keyed sets from their bottom-k sketches alone
    (Beyer et al. 2007) — the reason bottom-k beats a plain distinct
    sample: sketches of different sets COMPOSE.

    - union sketch = bottom-k of the merged hash sets; D̂(A∪B) is the
      usual KMV estimate on it;
    - Jaccard ρ̂ = |{h in union sketch : h ∈ S_A and h ∈ S_B}| / k,
      and D̂(A∩B) = (matches · D̂(A∪B)) div k — a true int64 integral
      division.

    When the union sketch saw fewer than k distinct hashes it is
    exhaustive and both answers are exact — including two empty (or
    all-NULL) inputs, which answer 0, not NULL (the sum over an empty
    sketch coalesces). One row out:
    (est_union, est_intersection, n_seen, n_both).
    """
    ha = (
        df_a.filter(value_a.isNotNull())
        .select(stable_hash64(value_a.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    hb = (
        df_b.filter(value_b.isNotNull())
        .select(stable_hash64(value_b.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    u = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    flagged = u.join(
        ha.withColumn("in_a", F.lit(1)), "h", "left"
    ).join(hb.withColumn("in_b", F.lit(1)), "h", "left")
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth"),
        # sum over the empty union sketch is NULL — coalesce so two
        # empty inputs answer n_both = 0 (and est_intersection = 0)
        # instead of NULL-ing out downstream arithmetic
        F.coalesce(
            F.sum(
                (
                    F.col("in_a").isNotNull() & F.col("in_b").isNotNull()
                ).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("n_both"),
    )
    est_u = kmv_estimate(F.col("n_seen"), F.col("kth"), k)
    # (n_both · est_union) div k as a true integral division — the
    # (x − x%k)/k float identity it replaces is exact only below 2^53
    pre = agg.select(
        est_u.alias("est_union"),
        F.col("n_seen").cast("long").alias("n_seen"),
        F.col("n_both").cast("long").alias("n_both"),
    )
    est_i = (
        F.when(F.col("n_seen") < F.lit(k), F.col("n_both"))
        .otherwise(F.expr(f"(n_both * est_union) div {int(k)}"))
        .cast("long")
    )
    return pre.select(
        "est_union",
        est_i.alias("est_intersection"),
        "n_seen",
        "n_both",
    )
