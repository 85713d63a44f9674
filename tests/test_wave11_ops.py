"""Units for the round-5 wave-11 operators: MaxSim late-interaction
scoring and the nucleus (top-p) cut."""

from pyspark.sql import functions as F


def test_maxsim_reference(spark):
    from det_module_spark.operators.similarity import maxsim_scores

    # doc A tokens: e1=[1,0], e2=[0,1]; doc B: [0.5, 0.5]
    docs = spark.createDataFrame(
        [("A", [1.0, 0.0]), ("A", [0.0, 1.0]), ("B", [0.5, 0.5])],
        ["doc", "embedding"],
    )
    qs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["qid", "embedding"]
    )
    got = {
        r["doc"]: (r["n_q"], r["maxsim_q"])
        for r in maxsim_scores(docs, qs).collect()
    }
    # quantization x1024: dots A: max(1024^2, 0)=1048576 per query;
    # B: 512*1024 per query
    assert got == {
        "A": (2, 2 * 1024 * 1024),
        "B": (2, 2 * 512 * 1024),
    }


def test_nucleus_filter_keeps_crossing_row(spark):
    from det_module_spark.operators.sampling import nucleus_filter

    rows = [("g", "a", 50), ("g", "b", 30), ("g", "c", 15), ("g", "d", 5)]
    df = spark.createDataFrame(rows, ["grp0", "item", "w"])
    kept = sorted(
        r["item"]
        for r in nucleus_filter(df, "grp0", "item", "w", 600_000).collect()
    )
    # total 100; p=0.6: 'a' (50) doesn't reach 60, keep 'b' which
    # crosses; 'c' starts at 80 >= 60 -> cut
    assert kept == ["a", "b"]
    # p=0.5: 'a' alone crosses
    kept2 = [
        r["item"]
        for r in nucleus_filter(df, "grp0", "item", "w", 500_000).collect()
    ]
    assert kept2 == ["a"]


def test_nucleus_filter_tie_break_deterministic(spark):
    from det_module_spark.operators.sampling import nucleus_filter

    rows = [("g", "b", 10), ("g", "a", 10), ("g", "c", 10)]
    df = spark.createDataFrame(rows, ["grp0", "item", "w"])
    kept = [
        (r["item"], r["rank"])
        for r in nucleus_filter(df, "grp0", "item", "w", 400_000)
        .orderBy("rank")
        .collect()
    ]
    # ties sort item asc: a rank1 (0 < 12), b rank2 (10 < 12), c cut
    assert kept == [("a", 1), ("b", 2)]
