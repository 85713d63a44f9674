"""Units for the round-5 wave-7 operators: rendezvous (HRW) sharding,
per-document character entropy, and k-fold assignment."""

import math

from pyspark.sql import functions as F


# ------------------------------------------------------- rendezvous


def test_rendezvous_minimal_movement(spark):
    from det_module_spark.operators.layout import rendezvous_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = df.select(
        "k",
        rendezvous_assign(df, F.col("k"), 8).alias("s8"),
        rendezvous_assign(df, F.col("k"), 9).alias("s9"),
    ).collect()
    assert all(0 <= r["s8"] < 8 and 0 <= r["s9"] < 9 for r in out)
    moved = sum(1 for r in out if r["s8"] != r["s9"])
    # HRW property: growing 8 -> 9 moves only keys whose 9th draw
    # wins — expected 1/9 ≈ 222 of 2000; mod-hashing would move ~8/9.
    assert moved < 2000 * 0.2, moved
    # and every moved key moved TO the new shard
    assert all(r["s9"] == 8 for r in out if r["s8"] != r["s9"])


def test_rendezvous_balanced_and_deterministic(spark):
    from det_module_spark.operators.layout import rendezvous_assign

    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    counts = {
        r["s"]: r["n"]
        for r in df.select(
            rendezvous_assign(df, F.col("k"), 4).alias("s")
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {0, 1, 2, 3}
    for n in counts.values():
        assert abs(n - 1000) < 150, counts  # ~uniform


# ----------------------------------------------------- char entropy


def test_char_entropy_reference_values(spark):
    from det_module_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    got = {
        r["id"]: r for r in char_entropy(df).collect()
    }
    # single char: H = 0 exactly
    assert got[1]["ent_q"] == 0 and got[1]["n_distinct"] == 1
    # two chars 50/50: H = ln 2
    lnq = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    want2 = lnq(4) - (2 * lnq(2) + 2 * lnq(2)) // 4
    assert got[2]["ent_q"] == want2
    assert abs(got[2]["ent_q"] / 1e9 - math.log(2)) < 1e-8
    # uniform over 4: H = ln 4 (c=1 terms have lnq(1)=0)
    assert abs(got[3]["ent_q"] / 1e9 - math.log(4)) < 1e-8


def test_char_entropy_flags_low_entropy(spark):
    from det_module_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "zzzzzzzzzzzzzzzzzzzz"), (2, "the quick brown fox!")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r["ent_q"] for r in char_entropy(df).collect()}
    assert got[1] < got[2]
    assert got[1] == 0


# ------------------------------------------------------------ kfold


def test_kfold_assign_partition_and_determinism(spark):
    from det_module_spark.operators.sampling import kfold_assign

    df = spark.range(0, 1000)
    out = df.select(
        "id", kfold_assign(F.col("id"), 5).alias("fold")
    )
    rows = {r["id"]: r["fold"] for r in out.collect()}
    assert set(rows.values()) == {0, 1, 2, 3, 4}
    rows2 = {r["id"]: r["fold"] for r in out.collect()}
    assert rows == rows2
    # roughly balanced
    from collections import Counter

    c = Counter(rows.values())
    for n in c.values():
        assert abs(n - 200) < 80, c
