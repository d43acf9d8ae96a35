"""Plan pins for bucketed co-located joins: the whole point is the
absence of Exchange between the bucketed scans and the sort-merge
join, so that is what gets asserted — plus value parity with the
plain shuffle join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.bucketing import bucketed_join, ensure_bucketed
from nutdb_spark.sources import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark):
    o = ensure_bucketed(
        spark, load_table(spark, SF, "orders"), SF, "orders", "o_orderkey"
    )
    li = ensure_bucketed(
        spark, load_table(spark, SF, "lineitem"), SF, "lineitem",
        "l_orderkey",
    )
    return o, li


def test_bucketed_join_has_no_exchange(bucketed):
    o, li = bucketed
    j = bucketed_join(o, li, "o_orderkey", "l_orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle
    assert "Bucketed: true" in plan


def test_unbucketed_baseline_does_shuffle(spark):
    # sanity: the same join over plain parquet DOES exchange — the
    # bucketing, not the data size, removes it
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    j = o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_join_values_match_shuffle_join(spark, bucketed):
    o, li = bucketed
    a = (
        bucketed_join(o, li, "o_orderkey", "l_orderkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    po = load_table(spark, SF, "orders")
    pl = load_table(spark, SF, "lineitem")
    b = (
        po.join(pl, po["o_orderkey"] == pl["l_orderkey"])
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partition_pruning_in_plan(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.bucketing import ensure_partitioned

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", F.col("value"), "event_type"
    )
    path = ensure_partitioned(spark, ev, SF, "events", "event_type")
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the scan as a PARTITION filter (directory
    # pruning), not a row-level pushed filter
    assert "PartitionFilters" in plan
    assert "click" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    n_part = df.select("event_type").distinct().count()
    assert n_part == 1


def test_dynamic_partition_pruning_fires(spark):
    """q_partition_pruning_dynamic's fact scan must carry the runtime
    dynamicpruning subquery on the partition column — the predicate
    only exists in the joined dimension, so a static PartitionFilters
    can't express it."""
    from nutdb_spark.suite import QUERIES

    df = QUERIES["q_partition_pruning_dynamic"](spark, SF)
    df.collect()  # materialize THIS DataFrame's own execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
