"""Market-basket co-occurrence: frequent item pairs + lift.

A two-item-set frequent-itemset miner (the workhorse slice of
FP-growth / a-priori). No reference equivalent (its merge joins are
keyed, queue/request_tools.py:617-708) — this is warehouse-standard
affinity analysis, and the same shape powers co-occurrence statistics
in corpus work (term x term, entity x entity).

Scale design: the pair generation is a self-join of the item list
WITHIN each basket key — shuffle keyed by basket id, output bounded by
sum(k_i choose 2), never a global cross join. Baskets are overwhelmingly
small (TPC-H orders: <= 7 lines); a pathological mega-basket would blow
k² — guard with ``max_basket_size`` (drop oversized baskets, standard
practice since they carry no affinity signal). Item supports come from
one extra aggregation; lift is computed on exact integer counts and
rounded once.

The distinct (basket, item) frame feeds four consumers (sizes, both
self-join sides, supports, the basket count) — it is materialized once
(``localCheckpoint``); without that each consumer re-runs the upstream
scan+distinct (measured 4.0s → ~1.5s on the sf0.1 brand graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    return (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def _capped_flat(items: DataFrame, max_basket_size: int) -> DataFrame:
    """The size-capped (basket, item) universe every downstream count
    shares. Materialized once (lazy checkpoint): it fans out to 2-5
    consumers (pair sides, supports, the basket count, triple
    extensions), each of which would otherwise re-run the basket-size
    aggregation and cap join."""
    sizes = items.groupBy("basket").agg(F.count(F.lit(1)).alias("__bsz"))
    return (
        items.join(
            sizes.filter(F.col("__bsz") <= max_basket_size), "basket"
        )
        .select("basket", "item")
        .localCheckpoint(eager=False)
    )


def _pairs_from_flat(flat: DataFrame, min_support: int) -> DataFrame:
    a = flat.select("basket", F.col("item").alias("item_a"))
    b = flat.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )


def pair_counts(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int = 1000,
) -> DataFrame:
    """(basket, item) rows -> (item_a < item_b, pair_count) for pairs
    co-occurring in >= ``min_support`` distinct baskets."""
    return _pairs_from_flat(
        _capped_flat(_items(df, basket_col, item_col), max_basket_size),
        min_support,
    )


def basket_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int = 1000,
    lift_digits: int = 6,
) -> DataFrame:
    """Frequent pairs enriched with per-item supports and lift =
    n_baskets * pair_count / (count_a * count_b), rounded to
    ``lift_digits``. All inputs to the ratio are exact integers, so the
    single rounded division is engine-stable.

    Every factor of the ratio is computed over the SAME size-capped
    basket universe the pairs come from: if n_baskets and the item
    supports included oversized (dropped) baskets while pair_count
    excluded them, lift would be systematically understated for items
    appearing in large baskets — an affinity of exactly 1.0 on the
    capped universe would report < 1.0."""
    flat = _capped_flat(
        _items(df, basket_col, item_col), max_basket_size
    )
    n_baskets = flat.select("basket").distinct().count()
    supports = flat.groupBy("item").agg(F.count(F.lit(1)).alias("item_count"))
    pairs = _pairs_from_flat(flat, min_support)
    scale = F.lit(float(10**lift_digits))
    lift = (
        F.lit(float(n_baskets))
        * F.col("pair_count").cast("double")
        / (F.col("count_a") * F.col("count_b")).cast("double")
    )
    # ``supports`` is item-vocabulary-sized and corpus-derived — no
    # forced broadcast; AQE broadcasts while small, shuffles at scale.
    return (
        pairs.join(
            supports.select(
                F.col("item").alias("item_a"),
                F.col("item_count").alias("count_a"),
            ),
            "item_a",
        )
        .join(
            supports.select(
                F.col("item").alias("item_b"),
                F.col("item_count").alias("count_b"),
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            (F.floor(lift * scale + F.lit(0.5)) / scale).alias("lift"),
        )
    )


def triple_counts(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Frequent 3-itemsets with genuine Apriori pruning: a triple is
    only COUNTED if all three of its pairs are frequent (downward
    closure), so the expensive third extension join runs over the
    frequent-pair occurrence stream, not the raw basket stream —
    the candidate-pruning step that makes itemset mining survive a
    100× basket blow-up.

    → (item_a < item_b < item_c, triple_count ≥ min_support).

    Shape: the pair stage is ``_pairs_from_items`` (size-capped);
    basket-level pair occurrences semi-join to the frequent-pair set
    BEFORE extending with the third item, and both extension pairs
    (a,c)/(b,c) prune by semi-join too. All equi-joins on basket/pair
    keys."""
    flat = _capped_flat(
        _items(df, basket_col, item_col), max_basket_size
    )
    pairs = _pairs_from_flat(flat, min_support)
    bp = (
        flat.select("basket", F.col("item").alias("item_a"))
        .join(flat.select("basket", F.col("item").alias("item_b")), "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .join(pairs.select("item_a", "item_b"), ["item_a", "item_b"], "left_semi")
    )
    ext = (
        bp.join(flat.select("basket", F.col("item").alias("item_c")), "basket")
        .filter(F.col("item_b") < F.col("item_c"))
        .join(
            pairs.select(
                F.col("item_a").alias("item_a"),
                F.col("item_b").alias("item_c"),
            ),
            ["item_a", "item_c"],
            "left_semi",
        )
        .join(
            pairs.select(
                F.col("item_a").alias("item_b"),
                F.col("item_b").alias("item_c"),
            ),
            ["item_b", "item_c"],
            "left_semi",
        )
    )
    return (
        ext.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("triple_count"))
        .filter(F.col("triple_count") >= min_support)
    )
