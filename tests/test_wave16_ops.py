"""Units for the round-5 wave-16 operators: URL canonicalization,
per-domain quota sampling, CUPED diagnostics, t-closeness audit."""

from pyspark.sql import functions as F


def _canon(spark, urls):
    from det_module_spark.operators.web import normalize_urls

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
    )
    rows = normalize_urls(df).orderBy("doc_id").collect()
    return [(r["canonical"], r["domain"]) for r in rows]


def test_normalize_urls_rules(spark):
    got = _canon(
        spark,
        [
            # scheme/host case, default port, trailing slash, fragment
            "HTTPS://WWW.Example.COM:443/A/B/#frag",
            # non-default port kept; duplicate slashes collapsed
            "http://example.com:8080//a///b",
            # tracking params dropped, survivors sorted, userinfo gone
            "http://u:p@example.com:80/x?utm_source=s&b=2&a=1&fbclid=z",
            # empty path -> '/', tracking-only query -> no '?'
            "https://sub.Example.org?gclid=123",
            # bare single-label host: domain falls back to the host
            "http://localhost/x/",
        ],
    )
    assert got[0] == ("https://www.example.com/A/B", "example.com")
    assert got[1] == ("http://example.com:8080/a/b", "example.com")
    assert got[2] == ("http://example.com/x?a=1&b=2", "example.com")
    assert got[3] == ("https://sub.example.org/", "example.org")
    assert got[4] == ("http://localhost/x", "localhost")


def test_normalize_urls_keeps_nondefault_scheme_port_pairs(spark):
    got = _canon(
        spark,
        ["http://a.io:443/p", "https://a.io:80/p", "https://a.io:443/p"],
    )
    assert got[0][0] == "http://a.io:443/p"
    assert got[1][0] == "https://a.io:80/p"
    assert got[2][0] == "https://a.io/p"


def _domain_df(spark, parts):
    rows = [("d%d.com" % (i % 3), i) for i in range(30)]
    return spark.createDataFrame(rows, ["domain", "doc_id"]).repartition(
        parts
    )


def test_domain_caps_cap_enforced_and_partition_independent(spark):
    from det_module_spark.operators.web import domain_caps

    a = {
        r["domain"]: (r["n_total"], r["n_kept"], r["kept_ids"])
        for r in domain_caps(_domain_df(spark, 1), cap=4).collect()
    }
    b = {
        r["domain"]: (r["n_total"], r["n_kept"], r["kept_ids"])
        for r in domain_caps(_domain_df(spark, 7), cap=4).collect()
    }
    assert a == b
    for dom, (n_total, n_kept, kept) in a.items():
        assert n_total == 10
        assert n_kept == 4
        ids = [int(x) for x in kept.split(",")]
        assert len(ids) == 4 and ids == sorted(ids)
        assert all(int(dom[1]) == i % 3 for i in ids)


def test_cuped_perfect_covariate(spark):
    from det_module_spark.operators.experiment import cuped_report

    # y == 2*x exactly for every unit -> theta = 2, corr^2 = 1
    rows = []
    for u in range(8):
        rows += [("m", u, True)] * (u + 1)  # x = u+1 pre events
        rows += [("m", u, False)] * (2 * (u + 1))  # y = 2x post events
    df = spark.createDataFrame(rows, ["stratum", "unit", "pre"])
    r = cuped_report(df, "stratum", "unit", F.col("pre")).collect()[0]
    assert r["n_units"] == 8
    assert r["theta_ppm"] == 2_000_000
    assert r["varred_ppm"] == 1_000_000
    assert r["cov_num"] * 2 == r["vary_num"]


def test_cuped_useless_covariate(spark):
    from det_module_spark.operators.experiment import cuped_report

    # constant x -> varx_num = 0 -> theta/varred null, moments exact
    rows = []
    for u in range(6):
        rows += [("m", u, True)]  # x = 1 for everyone
        rows += [("m", u, False)] * (u % 3 + 1)
    df = spark.createDataFrame(rows, ["stratum", "unit", "pre"])
    r = cuped_report(df, "stratum", "unit", F.col("pre")).collect()[0]
    assert r["varx_num"] == 0
    assert r["theta_ppm"] is None and r["varred_ppm"] is None


def _emd_ref(group_counts, all_counts, levels):
    """Pure-python ordered-EMD numerator: sum over non-final levels of
    |cum_g*N - cum_all*n_g|."""
    n_g = sum(group_counts.values())
    n_all = sum(all_counts.values())
    cg = ca = 0
    num = 0
    for lvl in sorted(levels)[:-1]:
        cg += group_counts.get(lvl, 0)
        ca += all_counts.get(lvl, 0)
        num += abs(cg * n_all - ca * n_g)
    return n_g, n_all, num


def test_t_closeness_matches_reference_and_flags_skew(spark):
    from det_module_spark.operators.privacy import t_closeness_report

    # group A mirrors the global distribution; group B concentrates
    # at the top level -> B's EMD is large, A's is small
    rows = (
        [("A", lvl) for lvl in (0, 1, 2, 3) for _ in range(3)]
        + [("B", 3)] * 8
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: (r["n_rows"], r["emd_num"], r["emd_ppm"], r["is_risky"])
        for r in t_closeness_report(
            df, ["g"], F.col("v"), t_ppm=200_000
        ).collect()
    }
    all_counts = {0: 3, 1: 3, 2: 3, 3: 11}
    levels = [0, 1, 2, 3]
    for g, cnts in (
        ("A", {0: 3, 1: 3, 2: 3, 3: 3}),
        ("B", {3: 8}),
    ):
        n_g, n_all, num = _emd_ref(cnts, all_counts, levels)
        ppm = num * 1_000_000 // ((len(levels) - 1) * n_g * n_all)
        assert got[g] == (n_g, num, ppm, ppm > 200_000), g
    # B concentrates at the top level, so its distance must dominate
    assert got["B"][2] > got["A"][2]
    assert got["B"][3] is True


def test_normalize_urls_idempotent(spark):
    """Canonicalization is a projection: canon(canon(u)) == canon(u)
    over a structured sample of the messy-URL space."""
    from det_module_spark.operators.web import normalize_urls

    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["A.b.COM", "x.org", "localhost", "u:p@Site.NET"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a//b/", "/A/b"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&a=0&gclid=g"]
    frags = ["", "#f"]
    urls = []
    i = 0
    for s in schemes:
        for h in hosts:
            for p in ports:
                urls.append(
                    s + "://" + h + p
                    + paths[i % 4] + queries[i % 4] + frags[i % 2]
                )
                i += 1
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
    )
    once = normalize_urls(df).select(
        "doc_id", F.col("canonical").alias("url")
    )
    twice = normalize_urls(once).select("doc_id", "canonical")
    got1 = {r["doc_id"]: r["url"] for r in once.collect()}
    got2 = {r["doc_id"]: r["canonical"] for r in twice.collect()}
    assert got1 == got2
