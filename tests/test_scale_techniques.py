"""Scale-technique proofs: salted skew joins produce identical results
to plain joins; bucketed tables co-locate joins with zero exchanges.
These are the explicit knobs for the cases AQE can't save (a single
hot key bigger than an executor; a fact-fact join repeated every run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def rows_key(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    from nutdb_spark.operators.skew import salted_join
    from nutdb_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o["o_custkey"] == c["c_custkey"])
    salted = salted_join(o, c, "o_custkey", "c_custkey", salt=4)
    cols = ["o_orderkey", "o_custkey", "c_custkey", "c_mktsegment"]
    assert rows_key(salted, cols) == rows_key(plain, cols)


def test_salted_join_left_outer(spark, sf_dir):
    from nutdb_spark.operators.skew import salted_join
    from nutdb_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey")
    )
    plain = c.join(big, c["c_custkey"] == big["o_custkey"], "left")
    salted = salted_join(c, big, "c_custkey", "o_custkey", salt=4, how="left")
    cols = ["c_custkey", "o_orderkey"]
    assert rows_key(salted, cols) == rows_key(plain, cols)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from nutdb_spark.sources import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Pre-bucketing both sides on the join key removes the join
    exchanges entirely — the repeated-fact-join pattern at 100 TB."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # and it still computes the right thing
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_asof_bucketed_equals_plain(spark, sf_dir):
    """The hot-key (time-bucketed) as-of join must produce exactly the
    rows of the plain per-key-window one."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.asof import asof_join, asof_join_bucketed
    from nutdb_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "click")
    # dedupe right timestamps per key: with duplicate (key, ts) right
    # rows both variants pick an arbitrary winner, which is fine for the
    # operator but not for an exact-equality test
    right = e.filter(F.col("event_type") == "purchase").dropDuplicates(
        ["user_id", "ts"]
    )
    kw = dict(
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload=["event_id", "value"],
    )
    plain = asof_join(left, right, **kw)
    bucketed = asof_join_bucketed(
        left, right, bucket=lambda c: F.floor(F.unix_timestamp(c) / 86400),
        **kw,
    )
    key = lambda rows: sorted(
        (r["event_id"], r["asof_event_id"], r["asof_value"]) for r in rows
    )
    a, b = key(plain.collect()), key(bucketed.collect())
    assert a == b and len(a) > 100
