"""Incremental aggregate maintenance: merge partial agg states.

The reference's defining optimization is incremental evaluation —
only missing items run, completed ones are reused from the
content-addressed cache (queue/request_tools.py:404-450, 479-498).
This operator is the same idea applied to aggregates: a standing
rollup (the "state") is updated with a new batch's partial aggregate
(the "delta") WITHOUT rescanning history.

Only works for algebraic aggregates whose state is additive —
sum / count (and anything derived from them: mean, ratios) and
min / max. The merged state is bit-identical to a full recompute when
the measures are exact (integers / integer cents), which is what makes
the equivalence oracle-checkable.

Scale shape: the delta is one partial aggregation of the new batch
(map-side combine, one shuffle keyed by the group keys); the merge is
a full-outer join state ⋈ delta on those keys + element-wise combine —
shuffle proportional to |state| + |delta|, never to history. This is
exactly what a materialized-view engine (or Delta's MERGE-based
rollup) does under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
    count_alias: str = "n_rows",
) -> DataFrame:
    """One partial-aggregate state frame: per ``keys``, a row count
    plus named sums / mins / maxes (``{out_name: source_col}``)."""
    aggs = [F.count(F.lit(1)).alias(count_alias)]
    for out, src in (sum_cols or {}).items():
        aggs.append(F.sum(src).alias(out))
    for out, src in (min_cols or {}).items():
        aggs.append(F.min(src).alias(out))
    for out, src in (max_cols or {}).items():
        aggs.append(F.max(src).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def _null_safe_keys(s: DataFrame, d: DataFrame, keys: list[str]):
    """NULL-SAFE merge condition over ``__sk_*`` / ``__dk_*`` aliased
    group keys: ``groupBy`` puts all NULL keys in ONE group, so a
    state merge joining with plain equality would emit that group
    TWICE (NULL never equi-matches) instead of combining it — the
    NULL-key-equi-join silent-wrong-answer class."""
    cond = None
    for k in keys:
        c = s[f"__sk_{k}"].eqNullSafe(d[f"__dk_{k}"])
        cond = c if cond is None else cond & c
    return cond


def _merged_keys(keys: list[str]):
    """Post-merge key columns: either side may be NULL for a
    one-sided group; for the all-NULL group both are NULL and the
    coalesce correctly keeps NULL."""
    return [
        F.coalesce(F.col(f"__sk_{k}"), F.col(f"__dk_{k}")).alias(k)
        for k in keys
    ]


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Combine two partial-agg states (same schema) into one: full
    outer join on ``keys``; counts and sums add, mins take least, maxes
    take greatest. Groups present in only one side pass through."""
    min_cols = min_cols or []
    max_cols = max_cols or []
    s = state.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[
            F.col(c).alias(f"__s_{c}")
            for c in [count_col, *sum_cols, *min_cols, *max_cols]
        ],
    )
    d = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        *[
            F.col(c).alias(f"__d_{c}")
            for c in [count_col, *sum_cols, *min_cols, *max_cols]
        ],
    )
    merged = s.join(d, _null_safe_keys(s, d, keys), "full_outer")

    def add(c: str):
        return (
            F.coalesce(F.col(f"__s_{c}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        ).alias(c)

    cols = [add(count_col)]
    cols += [add(c) for c in sum_cols]
    cols += [F.least(F.col(f"__s_{c}"), F.col(f"__d_{c}")).alias(c) for c in min_cols]
    cols += [
        F.greatest(F.col(f"__s_{c}"), F.col(f"__d_{c}")).alias(c)
        for c in max_cols
    ]
    return merged.select(*_merged_keys(keys), *cols)


def join_delta(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental INNER-join maintenance: the rows a standing join
    result gains when both inputs receive a batch of inserts —

        (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A ⋈ B  ∪  ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB

    so the delta of the view is exactly the three mixed terms, each a
    join of a (small) batch against a snapshot or another batch —
    never a rescan of A ⋈ B. This is classic incremental view
    maintenance (insert-only case); ``join_delta_retract`` below is
    the same identity over retraction multisets, which adds deletes.

    Scale shape: ΔA⋈B and A⋈ΔB broadcast the delta side when small
    (AQE decides); ΔA⋈ΔB is batch×batch. Shuffle is proportional to
    |Δ| + matched snapshot rows, independent of the standing result
    size."""
    return (
        delta_a.join(b, on)
        .unionByName(a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def join_delta_retract(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    weight: str = "_w",
) -> DataFrame:
    """Incremental INNER-join maintenance over RETRACTION multisets
    (Z-sets) — the deletes-capable generalization of ``join_delta``.

    ``delta_a`` / ``delta_b`` carry a signed integer ``weight`` column
    (+1 per inserted copy, -1 per deleted copy; any multiplicity
    works); ``a`` / ``b`` are the PRE-update snapshots, implicitly
    weight-1 per row. Over signed multiplicities the same identity
    holds exactly:

        Δ(A ⋈ B)  =  ΔA ⋈ B  +  A ⋈ ΔB  +  ΔA ⋈ ΔB

    with an output row's multiplicity the PRODUCT of its inputs'
    multiplicities (so delete × insert = a retraction of the joined
    row, delete × delete = a net insert, exactly as Z-set semantics
    require). The returned frame nets the three terms per distinct
    output row and drops zero-weight rows, so applying it to the
    standing view (union + re-net) reproduces (A+ΔA) ⋈ (B+ΔB)
    row-for-row.

    Scale shape: identical to ``join_delta`` — three joins each
    bounded by |Δ| on at least one side, one |Δ|-sized hash agg to
    net; never a rescan of the standing A ⋈ B."""
    wa, wb, w = "__wa", "__wb", weight
    da = delta_a.withColumnRenamed(weight, wa)
    db = delta_b.withColumnRenamed(weight, wb)
    t1 = da.join(b, on).withColumn(w, F.col(wa)).drop(wa)
    t2 = a.join(db, on).withColumn(w, F.col(wb)).drop(wb)
    t3 = (
        da.join(db, on)
        .withColumn(w, F.col(wa) * F.col(wb))
        .drop(wa, wb)
    )
    out = t1.unionByName(t2).unionByName(t3)
    group_cols = [c for c in out.columns if c != w]
    return (
        out.groupBy(*group_cols)
        .agg(F.sum(w).alias(w))
        .filter(F.col(w) != 0)
    )


def agg_delta_retract(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value: str,
    weight: str = "_w",
    count_alias: str = "n_rows",
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Incremental GROUPED-AGGREGATE maintenance over retraction
    multisets — the aggregate-side complement of ``join_delta_retract``
    (together they maintain any join+rollup view under inserts AND
    deletes without rescanning history).

    ``state`` is the standing view: per ``keys``, ``count_alias`` =
    Σw and ``sum_alias`` = Σw·x over everything applied so far.
    ``delta`` carries rows (keys, value, signed ``weight``): +1 per
    inserted copy, -1 per deleted copy (any multiplicity). COUNT and
    SUM are the linear aggregates, so the delta folds in exactly:

        count' = count + Σ_Δ w        sum' = sum + Σ_Δ w·x

    Groups whose maintained count reaches 0 vanished from the data
    and are dropped from the view (under consistent retractions a
    zero count implies a zero sum). Exact for integer measures —
    bit-identical to a full recompute, which is the oracle.

    Scale shape: one |Δ|-keyed partial aggregation (map-side combine)
    + one full-outer merge join on the group keys — shuffle ∝
    |state| + |Δ groups|, independent of history length. MIN/MAX are
    NOT maintainable this way under deletes (a retracted extremum
    needs history); that asymmetry is inherent to IVM, not this
    implementation — use merge_agg_state for insert-only min/max.
    """
    d = (
        delta.groupBy(*keys)
        .agg(
            F.sum(weight).alias("__dn"),
            F.sum(F.col(weight) * F.col(value)).alias("__ds"),
        )
        .select(
            *[F.col(k).alias(f"__dk_{k}") for k in keys],
            "__dn",
            "__ds",
        )
    )
    s = state.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        count_alias,
        sum_alias,
    )
    merged = s.join(d, _null_safe_keys(s, d, keys), "full_outer").select(
        *_merged_keys(keys),
        (
            F.coalesce(F.col(count_alias), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(count_alias),
        (
            F.coalesce(F.col(sum_alias), F.lit(0))
            + F.coalesce(F.col("__ds"), F.lit(0))
        ).alias(sum_alias),
    )
    return merged.filter(F.col(count_alias) != 0)
