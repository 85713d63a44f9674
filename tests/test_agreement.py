"""Cohen's kappa (r9-prep): exact-integer agreement QC — DuckDB twin
bit-identical, classic hand values reproduced, negative and
degenerate cases pinned."""

import duckdb

from det_module_spark.operators.agreement import (
    cohens_kappa,
    cohens_kappa_sql,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "item long, la string, lb string")
    got = cohens_kappa(df, "item", "la", "lb").collect()[0].asDict()
    con = duckdb.connect()
    df.toPandas().to_csv("/tmp/kappa.csv", index=False)
    con.execute(
        "CREATE VIEW labels AS SELECT * FROM "
        "read_csv_auto('/tmp/kappa.csv', all_varchar=false)"
    )
    oracle = con.execute(
        cohens_kappa_sql("SELECT item, la, lb FROM labels")
    ).fetchdf().iloc[0]
    for k in got:
        o = oracle[k]
        o = None if o != o else int(o)  # NaN -> NULL
        assert got[k] == o, (k, got[k], o)
    return got


def test_kappa_textbook_value(spark):
    # classic 2x2: a=20 yes/yes, d=15 no/no, b=5, c=10 (n=50)
    # po=0.7, pe=(25*30 + 25*20)/2500=0.5, kappa=0.4
    rows = (
        [(i, "y", "y") for i in range(20)]
        + [(100 + i, "n", "n") for i in range(15)]
        + [(200 + i, "y", "n") for i in range(5)]
        + [(300 + i, "n", "y") for i in range(10)]
    )
    got = _run(spark, rows)
    assert got["n_items"] == 50 and got["n_agree"] == 35
    assert got["po_ppm"] == 700_000 and got["pe_ppm"] == 500_000
    assert got["kappa_ppm"] == 400_000


def test_kappa_negative_when_below_chance(spark):
    rows = [(i, "y", "n") for i in range(10)] + [
        (100 + i, "n", "y") for i in range(10)
    ]
    got = _run(spark, rows)
    assert got["po_ppm"] == 0
    assert got["kappa_ppm"] < 0


def test_kappa_degenerate_constant_raters_null(spark):
    rows = [(i, "y", "y") for i in range(8)]
    got = _run(spark, rows)
    assert got["pe_ppm"] == PPM_FULL
    assert got["kappa_ppm"] is None


PPM_FULL = 1_000_000


def test_null_labels_dropped(spark):
    rows = [(1, "y", "y"), (2, None, "y"), (3, "n", None)]
    got = _run(spark, rows)
    assert got["n_items"] == 1 and got["n_agree"] == 1


# ---------------------------------------------------------------
# consensus + rater reliability (Dawid-Skene-lite QC table)
# ---------------------------------------------------------------

from det_module_spark.operators.agreement import (  # noqa: E402
    consensus_labels,
    rater_accuracy,
    rater_accuracy_sql,
)


def _votes(spark, rows):
    return spark.createDataFrame(
        rows, "item long, rater string, label string"
    )


def test_consensus_majority_and_tiebreak(spark):
    v = _votes(spark, [
        (1, "r1", "y"), (1, "r2", "y"), (1, "r3", "n"),
        (2, "r1", "a"), (2, "r2", "b"),  # tie -> lexicographic 'a'
    ])
    got = {r["item"]: r for r in consensus_labels(v).collect()}
    assert got[1]["consensus"] == "y" and got[1]["votes_for"] == 2
    assert got[1]["votes_total"] == 3
    assert got[2]["consensus"] == "a" and got[2]["votes_for"] == 1


def test_rater_accuracy_matches_duckdb_twin(spark):
    rows = []
    # r1 always right, r2 right 2/3, r3 contrarian on item 3
    for i, true in [(1, "y"), (2, "n"), (3, "y")]:
        rows.append((i, "r1", true))
        rows.append((i, "r2", true if i != 2 else "y"))
        rows.append((i, "r3", true if i != 3 else "n"))
    v = _votes(spark, rows)
    got = {
        r["rater"]: (r["n_votes"], r["n_match"], r["accuracy_ppm"])
        for r in rater_accuracy(v).collect()
    }
    assert got["r1"] == (3, 3, 1_000_000)
    assert got["r2"][1] == 2 and got["r2"][2] == 666_666
    con = duckdb.connect()
    v.toPandas().to_csv("/tmp/votes.csv", index=False)
    con.execute(
        "CREATE VIEW votes AS SELECT * FROM read_csv_auto('/tmp/votes.csv')"
    )
    oracle = con.execute(
        rater_accuracy_sql("SELECT item, rater, label FROM votes")
    ).fetchall()
    assert got == {r: (n, m, a) for r, n, m, a in oracle}


def test_rater_accuracy_null_votes_dropped(spark):
    v = _votes(spark, [(1, "r1", "y"), (1, "r2", None), (1, "r3", "y")])
    got = {r["rater"] for r in rater_accuracy(v).collect()}
    assert got == {"r1", "r3"}


# --- Krippendorff's alpha (round 9) ---


def _alpha_rows(spark, rows):
    from det_module_spark.operators.agreement import krippendorff_alpha

    votes = spark.createDataFrame(
        rows, "item long, rater string, label string"
    )
    return krippendorff_alpha(votes).collect()[0]


def test_krippendorff_perfect_agreement(spark):
    rows = [(i, r, "x" if i % 2 else "y")
            for i in range(1, 7) for r in ("a", "b", "c")]
    out = _alpha_rows(spark, rows)
    assert out["alpha_ppm"] == 1_000_000 and out["do_ppm"] == 0
    assert out["n_units"] == 6 and out["n_pairable"] == 6


def test_krippendorff_missing_labels_vs_float_reference(spark):
    # 4 raters, missing labels: unit a has a single label
    # (unpairable). The ppm output must match an independent
    # pure-Python float evaluation of the standard nominal estimator
    # to within the documented ~per-category ppm flooring.
    from collections import Counter, defaultdict

    grid = {
        "a": {2: "1"},
        "b": {1: "1", 2: "2", 3: "3", 4: "3"},
        "c": {1: "2", 2: "3", 3: "3", 4: "3"},
        "d": {1: "3", 2: "3", 3: "3", 4: "3"},
        "e": {1: "3", 2: "3", 3: "3", 4: "3"},
        "f": {1: "2", 2: "2", 3: "2", 4: "2"},
        "g": {1: "1", 2: "2", 3: "3", 4: "3"},
        "h": {1: "4", 2: "4", 3: "4", 4: "4"},
    }
    rows = [
        (ord(u) - ord("a"), str(r), lab)
        for u, labs in grid.items()
        for r, lab in labs.items()
    ]
    units = defaultdict(list)
    for i, _, lab in rows:
        units[i].append(lab)
    pair = {u: ls for u, ls in units.items() if len(ls) >= 2}
    n = sum(len(ls) for ls in pair.values())
    do = sum(
        nuc * (len(ls) - nuc) / (len(ls) - 1)
        for ls in pair.values()
        for nuc in Counter(ls).values()
    ) / n
    nc = Counter(lab for ls in pair.values() for lab in ls)
    de = sum(v * (n - v) for v in nc.values()) / (n * (n - 1))
    expected = 1 - do / de

    out = _alpha_rows(spark, rows)
    assert out["n_units"] == 8 and out["n_pairable"] == 7
    assert abs(out["alpha_ppm"] / 1e6 - expected) < 20e-6


def test_krippendorff_negative_alpha_matches_duckdb(spark):
    # systematic disagreement -> negative alpha; pins that Spark div
    # and DuckDB // agree on negative integer division (truncate
    # toward zero) through the full expression
    import duckdb

    from det_module_spark.operators.agreement import (
        krippendorff_alpha_sql,
    )

    rows = [(i, r, ("x" if (i + (r == "b")) % 2 else "y"))
            for i in range(1, 9) for r in ("a", "b")]
    out = _alpha_rows(spark, rows)
    assert out["alpha_ppm"] is not None and out["alpha_ppm"] < 0
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{r}', '{l}')" for i, r, l in rows)
    sql = krippendorff_alpha_sql(
        f"SELECT * FROM (VALUES {vals}) t(item, rater, label)"
    )
    ref = con.execute(sql).fetchone()
    assert (
        out["n_units"], out["n_pairable"], out["do_ppm"],
        out["de_ppm"], out["alpha_ppm"],
    ) == ref


def test_krippendorff_single_category_null_alpha(spark):
    rows = [(i, r, "same") for i in range(3) for r in ("a", "b")]
    out = _alpha_rows(spark, rows)
    assert out["de_ppm"] == 0 and out["alpha_ppm"] is None


def test_krippendorff_unit_overflow_guard_trips(spark, monkeypatch):
    """ADVICE r9: the D_o term nuc·(m−nuc)·1e6 wraps BIGINT silently
    past m ≈ 6.07e6 labels on one unit — the guard must raise, and
    must pass through untouched below the limit. Tested by lowering
    the limit rather than building a 6M-row unit."""
    import pytest as _pytest

    from det_module_spark.operators import agreement as ag

    rows = [(1, f"r{k}", "x" if k % 2 else "y") for k in range(6)] + [
        (2, "a", "x"), (2, "b", "y"),
    ]
    monkeypatch.setattr(ag, "KRIPP_UNIT_LIMIT", 5)
    votes = spark.createDataFrame(
        rows, "item long, rater string, label string"
    )
    with _pytest.raises(Exception, match="unit label count"):
        ag.krippendorff_alpha(votes).collect()
    monkeypatch.setattr(ag, "KRIPP_UNIT_LIMIT", 6)
    assert ag.krippendorff_alpha(votes).collect()[0]["n_pairable"] == 2


def test_krippendorff_nulls_and_unpairable_dropped(spark):
    rows = [
        (1, "a", "x"), (1, "b", "x"),
        (2, "a", None),               # null label: dropped
        (2, "b", "y"),                # unit 2 left with 1 label
        (3, "a", "y"),                # unpairable
    ]
    out = _alpha_rows(spark, rows)
    assert out["n_units"] == 3 and out["n_pairable"] == 1
