"""Event-analytics additions (sessionization, cohort retention,
funnel, join-key skew report) and the TPC-H Q6/Q10/Q18 queries:
value properties, cross-consistency between independent
implementations of the same semantics, and plan shape where it is
the 100 TB contract. Exact-value parity vs DuckDB is covered by
tools/check_parity.py over __spark_entry__.oracle_sql()."""

from pyspark.sql import functions as F

import __spark_entry__ as entry
from det_module_spark.sources.tables import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_sessionize_matches_session_window_aggregate(spark, sf_dir):
    # the lag-labeling dual must carve out exactly the sessions the
    # session_window aggregate produces (same 30-min gap rule)
    lab = entry.q_sessionize_events(spark, sf_dir)
    n_labeled = lab.select("user_id", "session_seq").distinct().count()
    n_agg = entry.q_events_session(spark, sf_dir).count()
    assert n_labeled == n_agg


def test_sessionize_labels_are_dense_and_start_at_one(spark, sf_dir):
    lab = entry.q_sessionize_events(spark, sf_dir)
    g = lab.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"),
        F.max("session_seq").alias("hi"),
        F.countDistinct("session_seq").alias("k"),
    )
    assert g.filter((F.col("lo") != 1) | (F.col("hi") != F.col("k"))).count() == 0


def test_cohort_day0_covers_every_user(spark, sf_dir):
    ret = entry.q_cohort_retention(spark, sf_dir)
    day0 = (
        ret.filter(F.col("day_offset") == 0)
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert day0 == n_users
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_cohort_user_days_conserved(spark, sf_dir):
    # Σ n_users over the retention matrix = #distinct (user, day) pairs
    ret = entry.q_cohort_retention(spark, sf_dir)
    total = ret.agg(F.sum("n_users")).collect()[0][0]
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select("user_id", F.to_date("ts")).distinct().count()
    assert total == user_days


def test_funnel_rows_and_nonnegative_latency(spark, sf_dir):
    pdf = entry.q_funnel_conversion(spark, sf_dir).toPandas()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(pdf) == n_users
    conv = pdf.dropna(subset=["secs_to_convert"])
    assert (conv["secs_to_convert"] >= 0).all()
    # converted implies signed up
    assert pdf[pdf["first_purchase_s"].notna()]["signup_s"].notna().all()


def test_tpch_q18_only_large_orders(spark, sf_dir):
    pdf = entry.q_tpch_q18(spark, sf_dir).toPandas()
    assert (pdf["sum_qty"] > 300).all()
    # one row per qualifying order
    assert pdf["o_orderkey"].is_unique


def test_tpch_q6_pushdown_reaches_scan(spark, sf_dir):
    # Q6 is the pushdown benchmark: date + quantity predicates reach
    # the parquet reader and only the three needed columns are read
    plan = _explain(entry.q_tpch_q6(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_tpch_q10_broadcasts_nation(spark, sf_dir):
    plan = _explain(entry.q_tpch_q10(spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_skew_report_shares_bounded_and_sorted(spark, sf_dir):
    pdf = entry.q_skew_report(spark, sf_dir).toPandas()
    assert (pdf["share_ppm"] <= 1_000_000).all()
    assert (pdf["share_ppm"] >= 0).all()
    assert list(pdf["n_rows"]) == sorted(pdf["n_rows"], reverse=True)
