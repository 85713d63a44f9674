"""Deterministic sampling operators.

``df.sample()`` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which is useless for reproducible
corpus construction at scale. These operators derive the keep/drop
decision from a content hash of a key column instead: the same row is
kept in every run, on every cluster size, in every engine that can
compute md5 (so the DuckDB oracle reproduces the exact sample).

Cost model: a projection + filter — no shuffle, fully pushed into the
scan stage; the filter prunes rows before anything downstream shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from det_module_spark.operators.dedup import stable_hash64

# hash-space resolution for fractions: 1e6 ≈ 4-digit precision on the
# fraction, far below sampling noise at any real corpus size
_RES = 1_000_000


def _bucket(key: Column, seed: str) -> Column:
    """Uniform bucket in [0, _RES) from md5(seed ':' key)."""
    return stable_hash64(F.concat(F.lit(f"{seed}:"), key.cast("string"))) % _RES


def hash_sample(
    df: DataFrame, key: Column, fraction: float, seed: str = "s0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``key``.
    Deterministic across runs, partitionings, and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(key, seed) < round(fraction * _RES))


def mixture_plan(
    available: dict[str, int], weights: dict[str, float], budget_rows: int
) -> dict[str, float]:
    """Training-data mixing: per-source sampling *rates* that realize a
    target mixture ``weights`` within a total row ``budget``.

    rate > 1 means the source is oversampled (repeated epochs), the
    standard remedy when a high-weight source is small. Driver-side
    arithmetic over per-source counts — the counts come from one
    ``groupBy(source).count()`` over the corpus."""
    total_w = sum(weights.values())
    return {
        s: budget_rows * (w / total_w) / max(available.get(s, 0), 1)
        for s, w in weights.items()
    }


def apply_mixture(
    df: DataFrame,
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "s0",
    copy_col: str = "copy",
) -> DataFrame:
    """Materialize a mixture: each row appears ``floor(rate)`` times
    plus one more with probability ``frac(rate)``, decided by content
    hash of ``(key, copy index)`` — deterministic across runs,
    partitionings, and engines (same property as ``hash_sample``).

    Scale shape: a projection + ``explode(sequence(...))`` + filter —
    no shuffle; output size is exactly ``sum(rate_s * n_s)`` rows in
    expectation, and downstream shuffles see only surviving rows.
    """
    rmilli = F.lit(round(default_rate * _RES))
    for value, rate in sorted(rates.items()):
        if rate < 0:
            raise ValueError(f"negative rate for {value!r}")
        rmilli = F.when(stratum == value, round(rate * _RES)).otherwise(rmilli)
    n_full = (rmilli / _RES).cast("long")
    frac = rmilli % _RES
    copy = F.col(copy_col)
    return df.withColumn(
        copy_col, F.explode(F.sequence(F.lit(0), n_full))
    ).filter(
        (copy < n_full)
        | (
            _bucket(
                F.concat(key.cast("string"), F.lit(":"), copy.cast("string")),
                seed,
            )
            < frac
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of low-resource languages, 10% of English). Strata not
    named in ``fractions`` fall back to ``default_fraction``."""
    cut = F.lit(round(default_fraction * _RES))
    for value, frac in sorted(fractions.items()):
        cut = F.when(stratum == value, round(frac * _RES)).otherwise(cut)
    return df.filter(_bucket(key, seed) < cut)


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key: Column,
    k: int,
    seed: str = "w0",
) -> DataFrame:
    """Weighted sampling without replacement (top-k), deterministic:
    the Efraimidis–Spirakis A-ES scheme with the uniform drawn from a
    content hash instead of an RNG.

    Each row gets u = (hash(key) % R + 1)/(R + 1) ∈ (0,1) and priority
    p = −ln(u)/w; the k smallest priorities form an exact weighted
    sample without replacement. Hash-derived u makes the sample
    reproducible across runs, partitionings, and engines (the DuckDB
    oracle reproduces it bit-for-bit: exact-int hash → one division →
    ln → one division; ranking on those doubles is engine-stable).

    Shape: projection + global top-k (TakeOrdered — no full sort, no
    shuffle of the losers). Rows with weight <= 0 are excluded (their
    priority is undefined), matching the A-ES contract."""
    u = (_bucket(key, seed) + 1).cast("double") / F.lit(float(_RES + 1))
    priority = -F.log(u) / weight.cast("double")
    return (
        df.filter(weight > 0)
        .withColumn("__priority", priority)
        .orderBy(F.col("__priority").asc(), key.cast("string").asc())
        .limit(k)
        .drop("__priority")
    )


def temperature_rates(
    counts: dict[str, int], budget_rows: int
) -> dict[str, float]:
    """Temperature-based mixture rates at α = 0.5 — the standard
    rebalancing for heterogeneous-source training corpora (small
    sources up-weighted, giant sources down-weighted; weights
    ∝ n_s^α).

    α is pinned to 0.5 so every step is engine-exact (ROUND_NOTES
    playbook): w_s = floor(sqrt(n_s)) uses the exactly-rounded IEEE
    sqrt (identical in any engine), and the rate is pure int64
    arithmetic  rmilli_s = (10^6 · budget · w_s) div (Σw · n_s) —
    reproducible bit-for-bit in SQL. General α needs pow(), whose
    last bit differs between libms; quantize weights first if you
    need it.

    Driver-side over the per-source count dict (control plane: one
    ``groupBy(source).count()`` collect, rows = number of sources).
    Feed the result straight to ``apply_mixture``: rates are integer
    millionths, so apply_mixture's round(rate·10^6) round-trips
    exactly."""
    import math

    w = {
        s: int(math.floor(math.sqrt(float(c))))
        for s, c in counts.items()
        if c > 0
    }
    total_w = sum(w.values())
    return {
        s: (_RES * budget_rows * w[s]) // (total_w * counts[s]) / _RES
        for s in w
    }


def sample_k_per_group(
    df: DataFrame,
    key: Column,
    by: list[str],
    k: int,
    seed: str = "k0",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample (fewer if the group is
    smaller) — the at-rest equivalent of per-group reservoir sampling,
    and the standard recipe for balanced eval-set construction.

    Rows are ranked inside each group by (content hash, key): the
    hash gives a uniform draw, the key breaks collisions totally, so
    the selection is reproducible across runs, partitionings, and
    engines. One partitioned window — parallelism is the number of
    groups, no global sort anywhere.

    Output: the sampled rows plus their ``sample_rank`` (1..k).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(
        _bucket(key, seed).asc(), key.asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def assign_split(
    df: DataFrame,
    key: Column,
    weights: dict[str, float],
    seed: str = "split0",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test-style split assignment: the
    content hash of ``key`` lands in [0, 1) and cumulative weight
    thresholds carve it into named splits (insertion order of
    ``weights``). Same row → same split on every run, partitioning,
    and engine; no RNG state, no shuffle — a projection.

    Assign on a CLUSTER id instead of the row id to make the split
    leakage-safe: near-duplicate documents then land in the same
    split by construction (see the leakage_safe_split driver query).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    b = _bucket(key, seed)
    expr = F.lit(None).cast("string")
    acc = 0.0
    cuts: list[tuple[str, int]] = []
    for name, w in weights.items():
        acc += w / total
        cuts.append((name, round(acc * _RES)))
    for name, cut in reversed(cuts):
        expr = F.when(b < cut, name).otherwise(expr)
    return df.withColumn(out, expr)


def negative_sample(
    interactions: DataFrame,
    user: str,
    item: str,
    pool_size: int = 50,
    k: int = 3,
    seed: str = "neg",
) -> DataFrame:
    """Popularity-based negative sampling for recommendation /
    contrastive training: → (user, item, neg_rank) with ``k``
    deterministic negatives per user drawn from the ``pool_size``
    most-interacted items the user has NOT interacted with.

    Construction: the candidate pool is a TakeOrdered top-``pool_size``
    of item interaction counts — a bounded frame independent of user
    count, broadcast by design; users cross the pool (|users| ×
    pool_size rows, linear in users), seen pairs leave via one
    left-anti join on (user, item), and each user keeps the k
    smallest md5 draws (window over ≤ pool_size rows per user).
    Popularity-biased negatives are the standard production choice —
    uniform negatives are mostly too easy — and the hash draw makes
    the sample replayable and cross-engine checkable.
    """
    from pyspark.sql import Window

    pop = (
        interactions.groupBy(F.col(item).alias("item"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .orderBy(F.desc("n_inter"), "item")
        .limit(pool_size)
        .select("item")
    )
    users = interactions.select(F.col(user).alias("user")).distinct()
    cand = users.crossJoin(F.broadcast(pop))
    seen = interactions.select(
        F.col(user).alias("user"), F.col(item).alias("item")
    ).distinct()
    unseen = cand.join(seen, ["user", "item"], "left_anti")
    draw = _bucket(
        F.concat_ws(":", F.col("user").cast("string"),
                    F.col("item").cast("string")),
        seed,
    )
    w = Window.partitionBy("user").orderBy("draw", "item")
    return (
        unseen.withColumn("draw", draw)
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
        .select("user", "item", "neg_rank")
    )


def kfold_assign(key: Column, k: int, seed: str = "fold") -> Column:
    """Deterministic k-fold id in [0, k) from the row's stable key —
    the cross-validation / ablation-split primitive. Pure hash
    Column: reproducible across runs, engines, and partitionings;
    compose with a grouping key (e.g. dedup cluster id, as
    leakage_safe_split does) to keep near-duplicates in one fold.
    """
    return stable_hash64(
        F.concat(F.lit(f"{seed}:"), key.cast("string"))
    ) % F.lit(k)


def nucleus_filter(
    weighted: DataFrame,
    group: str,
    item: str,
    weight: str,
    p_ppm: int,
) -> DataFrame:
    """Top-p (nucleus) cut per group: keep the smallest prefix of
    items — ordered by weight desc, item asc — whose cumulative
    weight reaches ``p_ppm`` millionths of the group total:
    → the kept rows as (grp, item, w, rank). The corpus-curation
    question "which items make up 90% of the mass" (sources, domains,
    near-dup clusters), and the data-side twin of nucleus sampling.

    Keep rule: a row stays iff the cumulative weight BEFORE it is
    still short of p·total — so the row that crosses the threshold is
    kept and nothing after it. All comparisons in int64
    ((cum−w)·1e6 < p_ppm·total; keep total·1e6 inside int64 — rescale
    weights beyond ~9e12 totals). One per-group window pass.
    """
    from pyspark.sql import Window

    base = weighted.select(
        F.col(group).alias("grp"),
        F.col(item).alias("item"),
        F.col(weight).cast("long").alias("w"),
    )
    w_ord = Window.partitionBy("grp").orderBy(F.desc("w"), F.asc("item"))
    w_all = Window.partitionBy("grp")
    cum = F.sum("w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    total = F.sum("w").over(w_all)
    ranked = base.select(
        "grp",
        "item",
        "w",
        F.row_number().over(w_ord).alias("rank"),
        ((cum - F.col("w")) * F.lit(1_000_000)).alias("before_scaled"),
        (total * F.lit(p_ppm)).alias("cut_scaled"),
    )
    return ranked.where(F.col("before_scaled") < F.col("cut_scaled")).select(
        "grp", "item", "w", "rank"
    )
