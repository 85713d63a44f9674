"""Tile-based duplicated-substring span detection."""

from pyspark.sql import Row

from det_module_spark.operators.spandedup import (
    doc_tiles,
    duplicated_tiles,
    span_dedup_report,
)

BOILER = "0123456789abcdef"  # one exact 16-char tile


def _docs(spark):
    return spark.createDataFrame(
        [
            # doc 0/1 share two contiguous boilerplate tiles (run of 2)
            Row(doc_id=0, text=BOILER + BOILER[::-1] + "uniquetail-zero!"),
            Row(doc_id=1, text=BOILER + BOILER[::-1] + "uniquetail-one!!"),
            # doc 2 repeats ONE tile internally (intra-doc duplication)
            Row(doc_id=2, text="qqqqqqqqqqqqqqqq" + "MIDDLEMIDDLEmidd" + "qqqqqqqqqqqqqqqq"),
            # doc 3: all-unique text + ragged tail (dropped)
            Row(doc_id=3, text="The quick brown fox jumps over!!" + "tail"),
            # doc 4: shorter than one tile -> zero tiles
            Row(doc_id=4, text="short"),
        ]
    )


def test_doc_tiles_disjoint_and_ragged_tail(spark):
    tiles = doc_tiles(_docs(spark), tile=16).collect()
    by_doc = {}
    for r in tiles:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 3 and len(by_doc[3]) == 2  # 36//16 == 2
    assert 4 not in by_doc  # sub-tile doc yields no rows (not [0,-1])
    assert [r["tile_text"] for r in sorted(by_doc[0], key=lambda r: r["tile_id"])][0] == BOILER
    assert all(len(r["tile_text"]) == 16 for r in tiles)


def test_duplicated_tiles_corpus_wide_and_intra_doc(spark):
    tiles = doc_tiles(_docs(spark), tile=16)
    dup = duplicated_tiles(tiles).collect()
    got = {(r["doc_id"], r["tile_id"]) for r in dup}
    # docs 0/1: both boilerplate tiles; doc 2: the repeated q-tile twice
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 2)}


def test_span_dedup_report_runs_and_ppm(spark):
    out = {
        r["doc_id"]: r
        for r in span_dedup_report(_docs(spark), tile=16).collect()
    }
    assert out[0]["n_tiles"] == 3 and out[0]["n_dup_tiles"] == 2
    assert out[0]["longest_dup_run"] == 2  # contiguous boilerplate
    assert out[0]["dup_ppm"] == 666666  # floor(2e6/3)
    # doc 2's dup tiles are NON-contiguous (ids 0 and 2): run stays 1
    assert out[2]["n_dup_tiles"] == 2 and out[2]["longest_dup_run"] == 1
    assert out[3]["n_dup_tiles"] == 0 and out[3]["dup_ppm"] == 0
    # sub-tile doc keeps its row, all-zero
    assert out[4]["n_tiles"] == 0 and out[4]["dup_ppm"] == 0
    assert set(out) == {0, 1, 2, 3, 4}


def test_strip_repeated_tiles_removes_all_but_first(spark):
    from pyspark.sql import functions as F

    from det_module_spark.operators.spandedup import strip_repeated_tiles

    blk = "A" * 24
    uniq = "".join(chr(ord("a") + i % 26) for i in range(24))
    # doc 1: blk + uniq; doc 2: blk twice + tail "xy"
    df = spark.createDataFrame(
        [(1, blk + uniq), (2, blk + blk + "xy")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in strip_repeated_tiles(df, tile=24).collect()}
    # doc 1 holds the canonical first occurrence: nothing removed
    assert out[1]["orig_len"] == 48 and out[1]["clean_len"] == 48
    assert out[1]["removed_ppm"] == 0
    # doc 2 loses BOTH copies (canonical lives in doc 1), keeps tail
    assert out[2]["orig_len"] == 50 and out[2]["clean_len"] == 2
    assert out[2]["removed_ppm"] == 960000


def test_strip_repeated_tiles_partition_independent(spark, sf_dir):
    from det_module_spark.operators.spandedup import strip_repeated_tiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    a = sorted(map(tuple, strip_repeated_tiles(docs.repartition(1)).collect()))
    b = sorted(map(tuple, strip_repeated_tiles(docs.repartition(9)).collect()))
    assert a == b
