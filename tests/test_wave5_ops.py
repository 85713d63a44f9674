"""Units for the round-5 wave-5 operators: row-pattern matching,
gaps-and-islands streaks, interval coalescing, precedence counts,
Adamic-Adar link prediction, int8 scalar quantization, and unicode
cleaning. Each pins semantics against a hand-checkable fixture or an
independent pure-Python reference; the driver's DuckDB oracles cover
the same operators at table scale."""

import datetime
import hashlib
import math

from pyspark.sql import functions as F


# ------------------------------------------------- sequence patterns


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user", "ts", "eid", "etype"])


def test_pattern_counts_non_overlapping_greedy(spark):
    from det_module_spark.operators.seqpattern import (
        sequence_pattern_counts,
    )

    rows = [
        # u1: v c v p v p  -> 'vcvpvp' has two 'v[vc]*p' matches
        (1, 1, 1, "view"),
        (1, 2, 2, "click"),
        (1, 3, 3, "view"),
        (1, 4, 4, "purchase"),
        (1, 5, 5, "view"),
        (1, 6, 6, "purchase"),
        # u2: p v c  -> no match (purchase precedes the view)
        (2, 1, 1, "purchase"),
        (2, 2, 2, "view"),
        (2, 3, 3, "click"),
        # u3: v x p -> unmapped type breaks the run
        (3, 1, 1, "view"),
        (3, 2, 2, "weird"),
        (3, 3, 3, "purchase"),
    ]
    got = {
        r["key"]: (r["seq_len"], r["n_matches"])
        for r in sequence_pattern_counts(
            _ev(spark, rows),
            "user",
            ["ts", "eid"],
            "etype",
            {"view": "v", "click": "c", "purchase": "p"},
            "v[vc]*p",
        ).collect()
    }
    assert got == {1: (6, 2), 2: (3, 0), 3: (3, 0)}


def test_pattern_order_uses_tiebreak(spark):
    from det_module_spark.operators.seqpattern import (
        sequence_pattern_counts,
    )

    # same ts — eid orders view before purchase => one match
    rows = [(1, 7, 1, "view"), (1, 7, 2, "purchase")]
    [r] = sequence_pattern_counts(
        _ev(spark, rows),
        "user",
        ["ts", "eid"],
        "etype",
        {"view": "v", "purchase": "p"},
        "vp",
    ).collect()
    assert r["n_matches"] == 1


# ---------------------------------------------------------- streaks


def test_longest_streaks(spark):
    from det_module_spark.operators.seqpattern import longest_streaks

    d = datetime.date
    rows = [
        # u1: 1-2-3 (streak 3), 6 (streak 1); duplicate day collapses
        (1, d(2024, 1, 1)),
        (1, d(2024, 1, 2)),
        (1, d(2024, 1, 2)),
        (1, d(2024, 1, 3)),
        (1, d(2024, 1, 6)),
        # u2: single day
        (2, d(2024, 2, 10)),
    ]
    df = spark.createDataFrame(rows, ["user", "day"])
    got = {
        r["key"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"])
        for r in longest_streaks(df, "user", F.col("day")).collect()
    }
    assert got == {1: (4, 2, 3), 2: (1, 1, 1)}


# ------------------------------------------------ interval coalesce


def test_coalesce_intervals_merges_contained_and_touching(spark):
    from det_module_spark.operators.seqpattern import coalesce_intervals

    rows = [
        # [0,10] contains [2,3]; [10,12] touches => one island [0,12]
        (1, 0, 10),
        (1, 2, 3),
        (1, 10, 12),
        # gap: [20,21]
        (1, 20, 21),
        (2, 5, 6),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = sorted(
        (r["key"], r["start_s"], r["end_s"], r["n_merged"])
        for r in coalesce_intervals(
            df, "k", F.col("s"), F.col("e")
        ).collect()
    )
    assert got == [(1, 0, 12, 3), (1, 20, 21, 1), (2, 5, 6, 1)]


def test_coalesce_running_max_not_prev_end(spark):
    from det_module_spark.operators.seqpattern import coalesce_intervals

    # [0,100], [1,2], [3,4]: prev-END logic would split at [3,4]
    # (3 > 2); the running max (100) keeps one island
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 2), (1, 3, 4)], ["k", "s", "e"]
    )
    got = coalesce_intervals(df, "k", F.col("s"), F.col("e")).collect()
    assert len(got) == 1 and got[0]["n_merged"] == 3


# ------------------------------------------------- precedence counts


def test_precedence_counts_first_occurrence_and_ties(spark):
    from det_module_spark.operators.seqpattern import precedence_counts

    rows = [
        # u1: first a@1, first b@5 (later b@2? no: b first at 2!)
        (1, 1, 1, "a"),
        (1, 2, 2, "b"),
        (1, 9, 3, "a"),
        # u2: tie at ts=4 -> 'a' < 'b' wins
        (2, 4, 1, "a"),
        (2, 4, 2, "b"),
        # u3: only b
        (3, 7, 1, "b"),
    ]
    df = _ev(spark, rows)
    got = {
        (r["type_a"], r["type_b"]): r["n_keys"]
        for r in precedence_counts(
            df, "user", "etype", F.col("ts")
        ).collect()
    }
    assert got == {("a", "b"): 2}


# ----------------------------------------------------- adamic-adar


def test_adamic_adar_matches_reference(spark):
    from det_module_spark.operators.graph import adamic_adar

    edges = [
        ("c1", "s1"),
        ("c2", "s1"),
        ("c3", "s1"),
        ("c1", "s2"),
        ("c2", "s2"),
        ("c1", "s3"),  # degree-1 neighbor: contributes nothing
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["aa_q"])
        for r in adamic_adar(e).collect()
    }
    w3 = math.floor(1e6 / math.log(3.0) + 0.5)
    w2 = math.floor(1e6 / math.log(2.0) + 0.5)
    assert got == {
        ("c1", "c2"): (2, w3 + w2),
        ("c1", "c3"): (1, w3),
        ("c2", "c3"): (1, w3),
    }


def test_adamic_adar_degree_cap_drops_hubs(spark):
    from det_module_spark.operators.graph import adamic_adar

    edges = [(f"c{i}", "hub") for i in range(5)] + [
        ("c0", "s"),
        ("c1", "s"),
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = adamic_adar(e, max_degree=3).collect()
    # the degree-5 hub is dropped; only the s-pair remains
    assert len(got) == 1 and got[0]["n_common"] == 1


# --------------------------------------------------- sq8 quantization


def test_sq8_codes_and_error_match_reference(spark):
    from det_module_spark.operators.quantize import sq8_quantize

    vecs = [
        (1, [0.0, 1.0]),
        (2, [1.0, 3.0]),
        (3, [0.5, 2.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        r["id"]: (r["code_sum"], r["err_q"])
        for r in sq8_quantize(df).collect()
    }

    cols = list(zip(*[v for _, v in vecs]))
    ref = {}
    for vid, v in vecs:
        cs, eq = 0, 0
        for d, x in enumerate(v):
            mn, mx = min(cols[d]), max(cols[d])
            code = (
                math.floor((x - mn) / (mx - mn) * 255.0 + 0.5)
                if mx > mn
                else 0
            )
            dq = mn + code * (mx - mn) / 255.0
            cs += code
            eq += math.floor((dq - x) * (dq - x) * 1e12 + 0.5)
        ref[vid] = (cs, eq)
    assert got == ref


def test_sq8_constant_dimension_is_exact(spark):
    from det_module_spark.operators.quantize import sq8_quantize

    df = spark.createDataFrame(
        [(1, [2.5, 0.0]), (2, [2.5, 1.0])], ["vec_id", "embedding"]
    )
    got = {r["id"]: r for r in sq8_quantize(df).collect()}
    # dim 0 constant: code 0, reconstructs mn == x exactly
    assert got[1]["err_q"] == 0  # 0.0 and 2.5 both exact endpoints
    assert got[2]["err_q"] == 0


def test_sq8_sql_twin_in_duckdb(spark):
    import duckdb
    import pandas as pd

    from det_module_spark.operators.quantize import sq8_quantize, sq8_sql

    vecs = [(i, [((i * 7 + d * 3) % 11) / 7.0 for d in range(4)])
            for i in range(8)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = (
        sq8_quantize(df)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(vecs, columns=["vec_id", "embedding"]),
    )
    want = con.sql(sq8_sql(dim=4) + " ORDER BY vec_id").df()
    assert got["code_sum"].tolist() == want["code_sum"].tolist()
    assert got["err_q"].tolist() == want["err_q"].tolist()


# ------------------------------------------------------ unicode clean


def test_unicode_clean_nfc_controls_whitespace(spark):
    from det_module_spark.operators.text import unicode_clean

    # e + COMBINING ACUTE composes to é under NFC (len 5 -> 4);
    # controls become spaces, runs collapse, ends trim
    raw = "cafe\u0301\x07  x\t\ty\n"
    df = spark.createDataFrame([(1, raw), (2, None)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unicode_clean(df).collect()}
    want = "café x y"
    assert got[1]["clean_len"] == len(want)
    assert (
        got[1]["clean_md5"]
        == hashlib.md5(want.encode("utf-8")).hexdigest()
    )
    assert got[2]["clean_md5"] is None
