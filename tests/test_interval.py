"""Interval-overlap join invariants (operators/interval.py).

The contract: every overlapping pair appears EXACTLY once (the
later-start bucket anchor), touching endpoints count, disjoint
intervals never pair — checked against a brute-force reference over
randomized intervals spanning many buckets.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.interval import interval_overlap_join


def test_interval_join_matches_bruteforce(spark):
    rnd = random.Random(1212)
    a_rows = []
    for i in range(60):
        s = rnd.randrange(0, 1000)
        a_rows.append((i, s, s + rnd.randrange(0, 120)))
    b_rows = []
    for i in range(40):
        s = rnd.randrange(0, 1000)
        b_rows.append((i, s, s + rnd.randrange(0, 250)))
    a = spark.createDataFrame(a_rows, "a_id long, a_start long, a_end long")
    b = spark.createDataFrame(b_rows, "b_id long, b_start long, b_end long")
    for bucket in (7, 50, 1000):
        got = sorted(
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(a, b, bucket=bucket).collect()
        )
        want = sorted(
            (ai, bi)
            for ai, s1, e1 in a_rows
            for bi, s2, e2 in b_rows
            if s1 <= e2 and s2 <= e1
        )
        assert got == want, bucket
        assert len(got) == len(set(got))  # exactly-once, no dups


def test_interval_join_touching_and_points(spark):
    a = spark.createDataFrame(
        [(0, 10, 20), (1, 30, 30)], "a_id long, a_start long, a_end long"
    )
    b = spark.createDataFrame(
        [(0, 20, 25), (1, 30, 30), (2, 21, 29)],
        "b_id long, b_start long, b_end long",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b, bucket=8).collect()
    )
    # touching at 20 counts; point-point at 30 counts; (10,20)x(21,29) no
    assert got == [(0, 0), (1, 1)]


def test_interval_join_rejects_bad_bucket(spark):
    a = spark.createDataFrame([(0, 1, 2)], "a_id long, a_start long, a_end long")
    with pytest.raises(ValueError, match="bucket"):
        interval_overlap_join(a, a.selectExpr(
            "a_id as b_id", "a_start as b_start", "a_end as b_end"
        ), bucket=0)


def test_interval_suite_plan_has_no_cartesian(spark):
    from nutdb_spark.suite import QUERIES

    plan = (
        QUERIES["q_join_interval"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
