"""Units for the round-5 wave-13 operators: Matryoshka truncation
audit, linear attribution, and OOV rate."""

from pyspark.sql import functions as F


def test_matryoshka_full_dim_is_identity_and_monotone_ish(spark):
    from det_module_spark.operators.similarity import matryoshka_audit

    # 20 deterministic vectors, dim 8
    vecs = [
        (i, [((i * 13 + d * 7) % 17 - 8) / 8.0 for d in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        r["dim_budget"]: r["n_overlap"]
        for r in matryoshka_audit(
            df, query_id=1, dims=[2, 4, 8], k=5
        ).collect()
    }
    assert got[8] == 5  # full budget reproduces the full top-k
    assert 0 <= got[2] <= 5 and 0 <= got[4] <= 5


def test_linear_attribution_hand_checked(spark):
    from det_module_spark.operators.attribution import linear_attribution

    # u1: view@1, click@2, purchase(90)@3, signup@4, purchase(30)@5
    rows = [
        (1, 1, 1, "view", 0.0),
        (1, 2, 2, "click", 0.0),
        (1, 3, 3, "purchase", 0.90),
        (1, 4, 4, "signup", 0.0),
        (1, 5, 5, "purchase", 0.30),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value"]
    )
    got = {
        r["channel"]: (r["n_touches"], r["credit_c"])
        for r in linear_attribution(
            df,
            "user_id",
            ["ts", "event_id"],
            channel=F.col("event_type"),
            is_touch=F.col("event_type").isin("view", "click", "signup"),
            is_conv=F.col("event_type") == "purchase",
            value=F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).collect()
    }
    # conv1 (90c): touches view, click -> 45 each
    # conv2 (30c): touches view, click, signup -> 10 each
    assert got == {
        "view": (2, 55),
        "click": (2, 55),
        "signup": (1, 10),
    }


def test_oov_rate_against_top_vocab(spark):
    from det_module_spark.operators.text import oov_rate

    docs = [
        (1, "a a a b"),     # a,b in vocab(2)
        (2, "a b zz qq"),   # zz,qq OOV
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_tok"], r["n_oov"], r["oov_ppm"])
        for r in oov_rate(df, vocab_size=2).collect()
    }
    assert got[1] == (4, 0, 0)
    assert got[2] == (4, 2, 500_000)
