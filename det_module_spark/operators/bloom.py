"""Bloom-filter semi-join pruning (runtime row filtering).

The classic big-join optimization: build a tiny bit-set over the dim
side's join keys, broadcast it, and drop fact rows whose key cannot
possibly match BEFORE the shuffle/join — the same idea as Spark's
runtime bloom-filter join (spark.sql.optimizer.runtime.bloomFilter),
implemented explicitly so the pruning is available to any plan shape
and is engine-portable.

- Hashes: the multiply/xor-shift integer mix from operators/cms.py —
  exact int64 on bounded inputs, so Spark and the DuckDB oracle set
  and test IDENTICAL bits (false positives included — the filter's
  output is deterministic, hence value-checkable).
- The bitmap packs m bits into 63-bit words (bit index ≤ 62, so no
  sign-bit shifts on either engine). It is collected to the driver
  and shipped as an array<long> literal: size is bounded by m/63
  longs (m = 4095 → 65 longs ≈ 0.5 KB) — a broadcast variable in
  disguise, never data-dependent.
- Membership is a pure Column/SQL expression (element_at + shiftright
  + mask): zero shuffle, zero Python, whole-stage codegen on the fact
  side.

False positives pass the filter (they are eliminated by the real join
that follows); true matches are never dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from det_module_spark.operators.cms import _MULT

WORD_BITS = 63


def _positions(v: Column, k: int, m: int) -> list[Column]:
    out = []
    for i in range(k):
        x = (v + F.lit(i * 1_000_003 + 1)) * F.lit(_MULT)
        mixed = x.bitwiseXOR(F.shiftright(x, 13))
        # pmod, not %: for negative keys the truncating % yields a
        # negative position — the Python build side would then pack
        # into a word aliased from the array END while the SQL probe
        # errors in element_at (index <= 0) — silent false negatives
        # (ADVICE r02). pmod keeps positions in [0, m) on both sides.
        out.append(F.pmod(mixed, F.lit(m)))
    return out


def bloom_build(
    keys: DataFrame, col: str, k: int = 3, m: int = 4095
) -> list[int]:
    """Bit-set over the key column as packed 63-bit words (python
    list of ints, length ceil(m/63)). The collect is bounded by the
    DISTINCT POSITIONS (≤ m), not the key count — this is the sketch
    being materialized, not data."""
    v = F.col(col).cast("long")
    pos = (
        keys.filter(v.isNotNull())  # NULL never equi-joins; no bit set
        .select(F.explode(F.array(*_positions(v, k, m))).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * ((m + WORD_BITS - 1) // WORD_BITS)
    for r in pos:
        p = r["pos"]
        words[p // WORD_BITS] |= 1 << (p % WORD_BITS)
    return words


def bloom_filter_df(
    fact: DataFrame,
    keys: DataFrame,
    fact_col: str,
    key_col: str | None = None,
    k: int = 3,
    m: int = 4095,
) -> DataFrame:
    """fact rows whose ``fact_col`` MIGHT be among keys' ``key_col``
    — the pre-join pruning pass. One bounded collect on the key side,
    zero shuffle and no join on the fact side: the bitmap rides along
    as an array literal and each hash tests one bit.

    NULL fact keys are dropped (the membership predicate is NULL),
    matching inner/semi equi-join semantics where NULL never
    matches."""
    words = bloom_build(keys, key_col or fact_col, k=k, m=m)
    out = fact.withColumn("_bm", F.lit(words))
    v = F.col(fact_col).cast("long")
    for i, pos in enumerate(_positions(v, k, m)):
        out = out.withColumn(f"_bfp{i}", pos)
    cond = " AND ".join(
        f"(shiftright(element_at(_bm, "
        f"cast(_bfp{i} div {WORD_BITS} as int) + 1), "
        f"cast(_bfp{i} % {WORD_BITS} as int)) & 1) = 1"
        for i in range(k)
    )
    return out.filter(F.expr(cond)).drop(
        "_bm", *[f"_bfp{i}" for i in range(k)]
    )
