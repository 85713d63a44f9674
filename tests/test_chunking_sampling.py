"""Chunking, packing, sampling, vocabulary heavy-hitters."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from det_module_spark.operators.chunking import chunk_documents, pack_sequences
from det_module_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)
from det_module_spark.operators.text import term_doc_freq


def _doc(spark, doc_id, words, lang="en"):
    return Row(doc_id=doc_id, text=" ".join(words), lang=lang)


def test_chunk_boundaries(spark):
    # 10 tokens, window 4, stride 3 -> chunks at offsets 0,3,6 (full)
    # and 9 (tail of 1): n_chunks = 1 + ceil((10-4)/3) = 3
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([_doc(spark, 1, words)])
    out = {
        r["chunk_id"]: r
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    assert len(out) == 3
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"
    assert out[2]["chunk_text"] == "w6 w7 w8 w9"
    assert all(out[i]["chunk_tokens"] == 4 for i in range(3))


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([_doc(spark, 1, ["a", "b"])])
    out = chunk_documents(df, window=4, stride=3).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "a b"
    assert out[0]["chunk_tokens"] == 2


def test_chunk_tail_shorter_than_window(spark):
    # 6 tokens, window 4, stride 4: second chunk holds only 2 tokens
    df = spark.createDataFrame([_doc(spark, 1, list("abcdef"))])
    out = sorted(
        chunk_documents(df, window=4, stride=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_tokens"] for r in out] == [4, 2]
    assert out[1]["chunk_text"] == "e f"


def test_pack_sequences_spans_and_offsets(spark):
    # token counts 100, 200, 50 with budget 128:
    #   doc 1: cum 0   -> bins 0..0, offset 0
    #   doc 2: cum 100 -> bins 0..2 (tokens 100..299), offset 100
    #   doc 3: cum 300 -> bins 2..2, offset 44
    rows = [
        _doc(spark, 1, ["x"] * 100),
        _doc(spark, 2, ["x"] * 200),
        _doc(spark, 3, ["x"] * 50),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=128, part_col="lang").collect()
    }
    assert (out[1]["bin_start"], out[1]["bin_end"], out[1]["bin_offset"]) == (0, 0, 0)
    assert (out[2]["bin_start"], out[2]["bin_end"], out[2]["bin_offset"]) == (0, 2, 100)
    assert (out[3]["bin_start"], out[3]["bin_end"], out[3]["bin_offset"]) == (2, 2, 44)


def test_pack_sequences_per_partition_streams(spark):
    # each lang shard gets an independent token stream
    rows = [
        _doc(spark, 1, ["x"] * 10, "en"),
        _doc(spark, 2, ["x"] * 10, "fr"),
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            spark.createDataFrame(rows), budget=8, part_col="lang"
        ).collect()
    }
    assert out[1]["cum_before"] == 0
    assert out[2]["cum_before"] == 0  # fr stream starts fresh


def test_hash_sample_partitioning_independent(spark, sf_dir):
    from det_module_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]
        for r in hash_sample(docs, F.col("doc_id"), 0.3).select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in hash_sample(
            docs.repartition(7), F.col("doc_id"), 0.3
        ).select("doc_id").collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_nested_fractions(spark, sf_dir):
    # a 10% sample is a strict subset of a 30% sample (same seed/key):
    # the keep rule is bucket < cut, so cuts nest
    from det_module_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    small = {r["doc_id"] for r in hash_sample(docs, F.col("doc_id"), 0.1).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, F.col("doc_id"), 0.3).select("doc_id").collect()}
    assert small <= big


def test_stratified_sample_respects_fractions(spark):
    rows = [
        _doc(spark, i, ["x"], "en" if i % 2 == 0 else "fr") for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    out = stratified_hash_sample(
        df, F.col("doc_id"), F.col("lang"), {"en": 0.0, "fr": 1.0}
    ).collect()
    langs = {r["lang"] for r in out}
    assert langs == {"fr"} and len(out) == 200


def test_term_doc_freq_distinct_per_doc(spark):
    rows = [
        _doc(spark, 1, ["apple", "apple", "apple", "pear"]),
        _doc(spark, 2, ["apple", "kiwi"]),
    ]
    out = {
        r["term"]: r["doc_freq"]
        for r in term_doc_freq(spark.createDataFrame(rows), min_df=1).collect()
    }
    # repeated within one doc counts once
    assert out == {"apple": 2, "pear": 1, "kiwi": 1}


def test_time_fill_locf(spark):
    import datetime

    from det_module_spark.operators.timefill import time_fill_locf

    def at(h):
        return datetime.datetime(2024, 1, 1, h, 30)

    rows = [
        Row(ts=at(0), event_type="a", value=1.0),
        Row(ts=at(0), event_type="a", value=2.0),
        # hours 1-2 silent for 'a'
        Row(ts=at(3), event_type="a", value=4.0),
        Row(ts=at(5), event_type="b", value=7.0),
    ]
    out = time_fill_locf(spark.createDataFrame(rows), unit="hour").collect()
    a = {r["bucket"].hour: r for r in out if r["event_type"] == "a"}
    assert sorted(a) == [0, 1, 2, 3]          # dense grid, a's own span
    assert (a[0]["n_events"], a[0]["is_gap"], a[0]["filled_value"]) == (2, 0, 3.0)
    assert (a[1]["n_events"], a[1]["is_gap"], a[1]["filled_value"]) == (0, 1, 3.0)
    assert (a[2]["n_events"], a[2]["is_gap"], a[2]["filled_value"]) == (0, 1, 3.0)
    assert (a[3]["n_events"], a[3]["is_gap"], a[3]["filled_value"]) == (1, 0, 4.0)
    b = [r for r in out if r["event_type"] == "b"]
    assert len(b) == 1 and b[0]["filled_value"] == 7.0


def test_mixture_plan_rates():
    from det_module_spark.operators.sampling import mixture_plan

    rates = mixture_plan(
        available={"a": 100, "b": 1000},
        weights={"a": 0.5, "b": 0.5},
        budget_rows=1000,
    )
    # a must be oversampled 5x to contribute half the 1000-row budget
    assert rates["a"] == 5.0 and rates["b"] == 0.5


def test_apply_mixture_copies_and_determinism(spark):
    from det_module_spark.operators.sampling import apply_mixture

    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    out = apply_mixture(
        df,
        F.col("doc_id"),
        F.col("source"),
        {"a": 3.0, "b": 0.4},
        default_rate=1.0,
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append((r.doc_id, r.copy))
    # integral rate -> exactly 3 copies of every 'a' row
    assert len(per["a"]) == 150
    assert all(c in (0, 1, 2) for _, c in per["a"])
    # fractional rate -> roughly 40% of 'b' rows, deterministic
    assert 10 <= len(per["b"]) <= 30
    again = apply_mixture(
        df.repartition(7),
        F.col("doc_id"),
        F.col("source"),
        {"a": 3.0, "b": 0.4},
        default_rate=1.0,
    ).collect()
    assert sorted((r.doc_id, r.copy) for r in again) == sorted(
        (r.doc_id, r.copy) for r in rows
    )


def test_time_fill_linear(spark):
    import datetime

    from det_module_spark.operators.timefill import time_fill_linear

    def at(h):
        return datetime.datetime(2024, 1, 1, h, 30)

    rows = [
        Row(ts=at(0), event_type="a", value=3.0),
        # hours 1-2 silent for 'a': interpolate 3 -> 9 over 3 steps
        Row(ts=at(3), event_type="a", value=9.0),
        Row(ts=at(5), event_type="b", value=7.0),
    ]
    out = time_fill_linear(spark.createDataFrame(rows), unit="hour").collect()
    a = {r["bucket"].hour: r for r in out if r["event_type"] == "a"}
    assert sorted(a) == [0, 1, 2, 3]
    assert (a[0]["n_events"], a[0]["is_gap"], a[0]["filled_value"]) == (1, 0, 3.0)
    assert (a[1]["n_events"], a[1]["is_gap"], a[1]["filled_value"]) == (0, 1, 5.0)
    assert (a[2]["n_events"], a[2]["is_gap"], a[2]["filled_value"]) == (0, 1, 7.0)
    assert (a[3]["n_events"], a[3]["is_gap"], a[3]["filled_value"]) == (1, 0, 9.0)
    # single-bucket key: no gaps, value passes through
    b = [r for r in out if r["event_type"] == "b"]
    assert len(b) == 1 and b[0]["filled_value"] == 7.0



def test_assign_split_proportions_and_determinism(spark):
    from pyspark.sql import functions as F

    from det_module_spark.operators.sampling import assign_split

    df = spark.createDataFrame([(i,) for i in range(10000)], ["id"])
    out = assign_split(
        df, F.col("id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {"train", "val", "test"}
    assert abs(per["train"] / 10000 - 0.8) < 0.03
    assert abs(per["val"] / 10000 - 0.1) < 0.02
    # repartitioning does not move rows between splits
    out2 = assign_split(
        df.repartition(13), F.col("id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
