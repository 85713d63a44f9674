"""Privacy operators: deterministic pseudonymization and k-anonymity
auditing.

A training-data pipeline that touches user data needs (a) stable
pseudonyms — the same raw identifier always maps to the same token so
joins/groupings still work, but the raw value never leaves the scan —
and (b) an audit answering "do the quasi-identifier combinations in
this release identify fewer than k individuals?".

Both are pure Column expressions / single aggregations:
- pseudonymize: md5(salt ‖ value) truncated to 16 hex chars, computed
  inside the scan projection (codegen, no Python). Salted so tokens
  are not globally linkable across datasets with different salts;
  rotate the salt to shred linkage (crypto-shredding-lite: without the
  salt the mapping is gone).
- k_anonymity_report: one hash aggregation over the quasi-identifier
  tuple; groups with fewer than k rows are the re-identification risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame, cols: list[str], salt: str, keep_raw: bool = False
) -> DataFrame:
    """Replace each column in ``cols`` with a 16-hex-char salted-hash
    pseudonym (or add ``<col>_pid`` beside it when ``keep_raw``).
    Nulls stay null."""
    out = df
    for c in cols:
        pid = F.when(
            F.col(c).isNotNull(),
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(c).cast("string"))),
                1,
                16,
            ),
        )
        if keep_raw:
            out = out.withColumn(f"{c}_pid", pid)
        else:
            out = out.withColumn(c, pid)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per quasi-identifier combination: → (quasi..., n_rows,
    is_risky) where ``is_risky`` marks groups smaller than ``k``.
    One aggregation; the risky-group count is the release gate."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("is_risky", F.col("n_rows") < k)
    )
