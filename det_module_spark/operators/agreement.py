"""Inter-annotator agreement — the QC gate a preference-labeling
pipeline runs before trusting pairwise labels (two raters label the
same items; how much of their agreement is beyond chance?).

Cohen's kappa, exact-integer contract (ROUND_NOTES playbook #10):

    po = agreements / n                      (observed agreement)
    pe = Σ_c (n_a,c · n_b,c) / n²            (chance agreement)
    κ  = (po - pe) / (1 - pe)

Everything is derived from counts, so both engines compute identical
BIGINTs; the two ratios are reported in ppm via integer division, and
κ itself as

    kappa_ppm = (po_ppm - pe_ppm)·1e6 div (1e6 - pe_ppm)

— one integer division of exact integers, no float anywhere. The ppm
quantization loses < 1e-6 per ratio (far below any labeling noise);
the division-free po/pe terms stay exact. pe_ppm = 1e6 (raters
constant and equal — κ undefined, 0/0) returns NULL kappa_ppm.

Magnitudes: po_ppm·1e6 ≤ 1e12 and pe's cross terms n_a,c·n_b,c ≤ n²
≤ 8.4e37 at n = 2^63... no — n_a,c·n_b,c overflows BIGINT past
n ≈ 3e9 per category. Guarded: pe is computed as
Σ (n_a,c·1e6 div n)·n_b,c div n — two-step integer division keeps
every intermediate ≤ n·1e6, exact to the same ppm contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def cohens_kappa(
    labels: DataFrame,
    item: str,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """``labels``: one row per item with both raters' labels (columns
    ``rater_a``, ``rater_b``; NULL-labeled rows are dropped — an
    unlabeled item is not an agreement sample). → one row:
    (n_items, n_agree, po_ppm, pe_ppm, kappa_ppm), all BIGINT
    (kappa_ppm NULL when pe = 1).

    Scale shape: one filter + two hash aggregations (per-category
    marginals joined on category — work ∝ distinct labels, not
    items²); no window, no collect.
    """
    df = labels.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(
        F.col(item).alias("item"),
        F.col(rater_a).cast("string").alias("la"),
        F.col(rater_b).cast("string").alias("lb"),
    )
    totals = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("la") == F.col("lb"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
    )
    ma = df.groupBy(F.col("la").alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("na")
    )
    mb = df.groupBy(F.col("lb").alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("nb")
    )
    # pe in ppm with overflow-safe two-step integer division:
    # Σ ((na·1e6 div n)·nb div n)
    pe = (
        ma.join(mb, "cat")
        .crossJoin(totals.select("n"))
        .select(
            F.expr(f"(na * {PPM}L div n) * nb div n").alias("pe_term")
        )
        .agg(F.sum("pe_term").cast("long").alias("pe_ppm"))
    )
    return (
        totals.crossJoin(pe)
        .select(
            F.col("n").alias("n_items"),
            "n_agree",
            F.expr(f"n_agree * {PPM}L div n").alias("po_ppm"),
            "pe_ppm",
            F.when(
                F.col("pe_ppm") < PPM,
                F.expr(
                    f"(n_agree * {PPM}L div n - pe_ppm) * {PPM}L "
                    f"div ({PPM}L - pe_ppm)"
                ),
            )
            .cast("long")
            .alias("kappa_ppm"),
        )
    )


def cohens_kappa_sql(labels_sql: str) -> str:
    """DuckDB twin — identical integer algebra. ``labels_sql`` must
    produce columns (item, la, lb)."""
    return f"""
    WITH df AS (
      SELECT item, CAST(la AS VARCHAR) AS la, CAST(lb AS VARCHAR) AS lb
      FROM ({labels_sql})
      WHERE la IS NOT NULL AND lb IS NOT NULL),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM df),
    ma AS (SELECT la AS cat, CAST(COUNT(*) AS BIGINT) AS na
           FROM df GROUP BY 1),
    mb AS (SELECT lb AS cat, CAST(COUNT(*) AS BIGINT) AS nb
           FROM df GROUP BY 1),
    pe AS (
      SELECT CAST(SUM((na * {PPM} // n) * nb // n) AS BIGINT) AS pe_ppm
      FROM ma JOIN mb USING (cat) CROSS JOIN totals)
    SELECT t.n AS n_items, t.n_agree,
           CAST(t.n_agree * {PPM} // t.n AS BIGINT) AS po_ppm,
           pe.pe_ppm,
           CAST(CASE WHEN pe.pe_ppm < {PPM}
                THEN (t.n_agree * {PPM} // t.n - pe.pe_ppm) * {PPM}
                     // ({PPM} - pe.pe_ppm)
                ELSE NULL END AS BIGINT) AS kappa_ppm
    FROM totals t CROSS JOIN pe"""
