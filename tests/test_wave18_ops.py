"""Units for the round-5 wave-18 operators: Markov matrix powers,
content-defined chunking, JSON key profiling."""

import pytest
from pyspark.sql import functions as F


def _power_ref(p1, k):
    """Pure-python P^k with the same ppm truncation per squaring."""
    cur = dict(p1)
    steps = k.bit_length() - 1
    for _ in range(steps):
        nxt = {}
        for (a, m1), pam in cur.items():
            for (m2, b), pmb in cur.items():
                if m1 == m2:
                    nxt[(a, b)] = nxt.get((a, b), 0) + pam * pmb
        cur = {ab: v // 1_000_000 for ab, v in nxt.items()}
    return cur


def test_markov_power_matches_reference(spark):
    from det_module_spark.operators.sequence import markov_power

    p1 = {
        ("a", "a"): 250_000, ("a", "b"): 750_000,
        ("b", "a"): 500_000, ("b", "c"): 500_000,
        ("c", "c"): 1_000_000,
    }
    df = spark.createDataFrame(
        [(a, b, p) for (a, b), p in p1.items()],
        ["from_state", "to_state", "p_ppm"],
    )
    for k in (2, 4):
        got = {
            (r["from_state"], r["to_state"]): r["p_ppm"]
            for r in markov_power(df, k).collect()
        }
        assert got == _power_ref(p1, k), k
        # truncation only loses mass: row sums stay <= 1e6
        rows = {}
        for (a, _b), p in got.items():
            rows[a] = rows.get(a, 0) + p
        assert all(v <= 1_000_000 for v in rows.values())


def test_markov_power_rejects_non_power_of_two(spark):
    from det_module_spark.operators.sequence import markov_power

    df = spark.createDataFrame(
        [("a", "a", 1_000_000)], ["from_state", "to_state", "p_ppm"]
    )
    with pytest.raises(ValueError):
        markov_power(df, 3)


def _chunks(spark, docs):
    from det_module_spark.operators.chunking import content_defined_chunks

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {}
    for r in content_defined_chunks(df, modulus=4).collect():
        out.setdefault(r["id"], []).append(
            (r["chunk_id"], r["n_words"], r["chunk_hash"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_cdc_chunks_shift_robust(spark):
    words = " ".join("w%d" % (i * 17 % 61) for i in range(120))
    base = _chunks(spark, [(1, words)])[1]
    shifted = _chunks(spark, [(2, "PREFIXWORD " + words)])[2]
    # all but the first chunk survive a front insertion byte-identical
    base_hashes = [h for _, _, h in base]
    shifted_hashes = [h for _, _, h in shifted]
    assert base_hashes[1:] == shifted_hashes[len(shifted_hashes) - len(base_hashes) + 1:]
    assert set(base_hashes[1:]) <= set(shifted_hashes)


def test_cdc_chunks_cover_document_exactly(spark):
    text = " ".join("t%d" % (i % 37) for i in range(80))
    got = _chunks(spark, [(7, text)])[7]
    assert sum(n for _, n, _ in got) == 80
    assert [c for c, _, _ in got] == list(range(len(got)))


def test_json_key_profile_types(spark):
    from det_module_spark.operators.semistructured import json_key_profile

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "b": "y", "c": true}',),
        ('{"a": null, "c": false}',),
        ('{"a": -7}',),
    ]
    df = spark.createDataFrame(rows, ["j"])
    got = {
        (r["key"], r["vtype"]): (r["n"], r["example"])
        for r in json_key_profile(df, "j").collect()
    }
    assert got[("a", "int")] == (2, "-7")
    assert got[("a", "float")] == (1, "2.5")
    assert got[("a", "null")] == (1, "null")
    assert got[("b", "string")][0] == 2
    assert got[("c", "bool")][0] == 2
    assert not any(t == "other" for (_k, t) in got)
