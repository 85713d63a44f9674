"""Duplicated-substring span detection (tile-based exact span dedup).

Doc-level dedup (operators/dedup.py) removes whole near-duplicate
documents, but pretraining corpora also carry *repeated spans inside
otherwise-unique documents* — boilerplate headers, license blocks,
templated paragraphs. The training-data literature removes these with
a corpus-wide suffix array (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better"); a global suffix array does not
distribute, so production pipelines use the tiling relaxation this
module implements:

1. cut every document into DISJOINT ``tile``-character tiles (the
   ragged tail shorter than ``tile`` is dropped — exact, engine-
   portable arithmetic);
2. a tile is *duplicated* when its exact text occurs >= 2 times
   corpus-wide (across documents or repeated within one);
3. per document, report the duplicated-tile count, the duplicated
   fraction (ppm, exact integer), and the longest CONTIGUOUS run of
   duplicated tiles — the quantity span-removal would cut.

Any repeated substring of length >= 2*tile - 1 is guaranteed to cover
at least one full tile in each occurrence, so tiling never misses long
duplicated spans; spans shorter than one tile can be missed (the
standard recall trade-off of tiling vs suffix arrays).

Scale: tiling is a projection + explode that re-emits each text once
(~1x data volume); duplicate detection is ONE hash aggregation on the
tile text (at 100 TB you would group on ``xxhash64(tile)`` — 8 bytes
of shuffle per tile instead of the text; the plan is identical and the
raw-text key keeps the SQL oracle trivially portable, collision-free
by construction); the run-length step windows per document, bounded by
document length. No self-join, no quadratic term anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_tiles(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    tile: int = 24,
) -> DataFrame:
    """(id, tile_id, tile_text): disjoint ``tile``-char windows.

    n_tiles = length(text) div tile, via (n - n % tile) / tile so the
    quotient is exact integer arithmetic in every engine (playbook #7:
    floor(a/b) over doubles can cross an integer boundary)."""
    if tile < 1:
        raise ValueError("tile must be >= 1")
    n = F.length(F.col(text))
    n_tiles = ((n - n % tile) / tile).cast("long")
    # sequence(0, -1) would DESCEND in Spark; empty-tile docs must
    # yield an empty array (dropped by explode) instead
    ids = F.when(n_tiles > 0, F.sequence(F.lit(0), n_tiles - 1)).otherwise(
        F.array().cast("array<long>")
    )
    base = df.select(
        F.col(id_col),
        F.col(text),
        F.explode(ids).alias("tile_id"),
    )
    return base.select(
        F.col(id_col),
        F.col("tile_id"),
        F.substring(F.col(text), F.col("tile_id") * tile + 1, tile).alias(
            "tile_text"
        ),
    )


def duplicated_tiles(tiles: DataFrame) -> DataFrame:
    """Tiles whose exact text occurs >= 2 times corpus-wide.

    One hash aggregation (partial map-side combine applies) + a semi
    join of the tile stream against the duplicated-text set."""
    dup_texts = (
        tiles.groupBy("tile_text")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") >= 2)
        .select("tile_text")
    )
    return tiles.join(dup_texts, "tile_text", "semi")


def span_dedup_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    tile: int = 24,
) -> DataFrame:
    """Per-document duplicated-span report.

    Output: id, n_tiles, n_dup_tiles, longest_dup_run (max contiguous
    duplicated tiles; 0 when none), dup_ppm (duplicated fraction of
    the tiled prefix in parts-per-million, exact integer). Documents
    shorter than one tile report all-zero."""
    tiles = doc_tiles(df, id_col, text, tile).localCheckpoint(eager=True)
    dup = duplicated_tiles(tiles)
    # contiguous runs: within a doc, duplicated tiles with consecutive
    # tile_id share (tile_id - rank-among-dup-tiles)
    w = Window.partitionBy(id_col).orderBy("tile_id")
    runs = (
        dup.withColumn("grp", F.col("tile_id") - F.row_number().over(w))
        .groupBy(id_col, "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy(id_col)
        .agg(
            F.sum("run_len").alias("n_dup_tiles"),
            F.max("run_len").alias("longest_dup_run"),
        )
    )
    totals = tiles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tiles"))
    out = (
        df.select(F.col(id_col))
        .join(totals, id_col, "left")
        .join(runs, id_col, "left")
    )
    n_tiles = F.coalesce("n_tiles", F.lit(0))
    n_dup = F.coalesce("n_dup_tiles", F.lit(0))
    return out.select(
        F.col(id_col),
        n_tiles.alias("n_tiles"),
        n_dup.alias("n_dup_tiles"),
        F.coalesce("longest_dup_run", F.lit(0)).alias("longest_dup_run"),
        F.when(n_tiles > 0, (n_dup * 1000000 - (n_dup * 1000000) % n_tiles) / n_tiles)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_ppm"),
    )


def strip_repeated_tiles(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    tile: int = 24,
) -> DataFrame:
    """Span REMOVAL (the transform to span_dedup_report's detector):
    every corpus-wide occurrence of a duplicated tile except the
    canonical first one — smallest (doc_id, tile_id) — is cut from
    its document; surviving tiles plus the ragged tail reassemble in
    order. This is the all-but-one-occurrence removal of Lee et al.
    2022, under the same tiling relaxation as the detector.

    Output: (id, orig_len, clean_len, removed_ppm) with
    removed_ppm = exact-integer millionths of characters removed.

    Scale shape: one hash aggregation finds each tile text's
    canonical occurrence (min struct — no window over the corpus),
    one equi-join on the tile text marks survivors, and one per-doc
    aggregation reassembles (array_sort of (tile_id, text) structs —
    bounded by document length). No self-join; shuffle keys are tile
    text (hash the tile at 100 TB, as the detector notes).
    """
    # the tiling pass feeds BOTH the canonical-first aggregation and
    # the survivor join — materialize it once (lazy checkpoint, the
    # same fan-out cut span_dedup_report applies) instead of running
    # the explode+substring scan twice
    tiles = doc_tiles(df, id_col, text, tile).localCheckpoint(eager=False)
    first = tiles.groupBy("tile_text").agg(
        F.min(F.struct(F.col(id_col), F.col("tile_id"))).alias("first")
    )
    kept = (
        tiles.join(first, "tile_text")
        .filter(
            (F.col(id_col) == F.col("first").getField(id_col))
            & (F.col("tile_id") == F.col("first.tile_id"))
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("tile_id"), F.col("tile_text"))
                        )
                    ),
                    lambda s: s.tile_text,
                ),
                "",
            ).alias("_kept_text")
        )
    )
    n = F.length(F.col(text))
    tail_start = (n - n % tile) + 1
    out = (
        df.select(
            F.col(id_col),
            n.alias("orig_len"),
            F.substring(F.col(text), tail_start, F.lit(tile)).alias("_tail"),
        )
        .join(kept, id_col, "left")
        .select(
            id_col,
            "orig_len",
            (
                F.length(F.coalesce(F.col("_kept_text"), F.lit("")))
                + F.length(F.col("_tail"))
            ).alias("clean_len"),
        )
    )
    removed = F.col("orig_len") - F.col("clean_len")
    ppm = F.when(
        F.col("orig_len") > 0,
        (
            (removed * 1_000_000 - (removed * 1_000_000) % F.col("orig_len"))
            / F.col("orig_len")
        ).cast("long"),
    ).otherwise(F.lit(0))
    return out.withColumn("removed_ppm", ppm)
