"""Pins for the heavy-hitter topK/topKWeighted lowering (VERDICT r6
"What's wrong" #1): plain-GROUP-BY topK must lower to a (keys, value)
pre-aggregate + bounded per-key top-k — never one collect_list over a
group's raw rows, whose per-group state is O(rows) and OOMs a task on
one hot group at 100 TB. Since round 8 the same bounded two-level plan
also serves rollup/cube/totals/grouping sets (each set's counts are
re-summed from the shared (keys, value) pre-aggregate —
tests/test_advice_r8.py pins those)."""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def _with_frame(eng, name, df):
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == name else real(n)
    return eng


def test_hot_group_no_per_group_row_state(spark, eng):
    # ONE hot group: 40k rows, 7 distinct values. The old lowering
    # collected all 40k rows into one aggregation buffer; the new plan
    # carries at most |distinct| rows per group past level 1.
    df = spark.range(40_000).selectExpr(
        "'hot' as k", "cast(id % 7 as int) as v"
    )
    _with_frame(eng, "hotg", df)
    out = eng.sql(
        "select k, topK(3)(v) as tk, count(*) as n from hotg group by k"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bounded per-key top-k is a row_number window over the
    # level-1 counts — sort-based and spillable
    assert "Window" in plan
    r = out.collect()[0]
    # id % 7: values 0..2 appear 5715 times, 3..6 appear 5714
    assert r["tk"] == [0, 1, 2] and r["n"] == 40_000


def test_topk_ties_and_other_aggs(spark, eng):
    df = spark.createDataFrame(
        [("a", 0)] * 5 + [("a", 1)] * 3 + [("a", 2)] * 3 + [("b", 9)] * 2,
        "k string, v int",
    )
    _with_frame(eng, "tkx", df)
    rows = eng.sql(
        "select k, topK(2)(v) as tk, sum(v) as s from tkx "
        "group by k order by k"
    ).collect()
    # count desc then value asc: a → [0, 1] (1 beats 2 on the tie)
    assert [(r["k"], r["tk"], r["s"]) for r in rows] == [
        ("a", [0, 1], 9),
        ("b", [9], 18),
    ]


def test_topk_global_uses_take_ordered(spark, eng):
    df = spark.createDataFrame(
        [(0,)] * 5 + [(1,)] * 3 + [(2,)] * 3, "x int"
    )
    _with_frame(eng, "tkg", df)
    out = eng.sql("select topK(2)(x) as tk from tkg")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    assert out.collect()[0]["tk"] == [0, 1]


def test_topk_all_null_group_yields_empty_array(spark, eng):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", None), (None, 2)],
        "k string, v int",
    )
    _with_frame(eng, "tkn", df)
    rows = eng.sql(
        "select k, topK(2)(v) as tk from tkn group by k order by k nulls first"
    ).collect()
    got = [(r["k"], r["tk"]) for r in rows]
    # NULL group key survives the null-safe join-back; all-NULL group → []
    assert got == [(None, [2]), ("a", [1]), ("b", [])]


def test_topk_weighted_two_level(spark, eng):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 3), ("a", 2, 3), ("a", 3, 5), ("b", 7, 1)],
        "k string, v int, w int",
    )
    _with_frame(eng, "tkw", df)
    rows = eng.sql(
        "select k, topKWeighted(2)(v, w) as tk from tkw group by k order by k"
    ).collect()
    # a: weights 1→10, 2→6, 3→5 → [1, 2]
    assert [(r["k"], r["tk"]) for r in rows] == [
        ("a", [1, 2]),
        ("b", [7]),
    ]


def test_topk_under_rollup_values(spark, eng):
    df = spark.createDataFrame(
        [("a", 0)] * 3 + [("a", 1)] * 2 + [("b", 1)] * 4, "k string, v int"
    )
    _with_frame(eng, "tkr", df)
    rows = eng.sql(
        "select k, topK(1)(v) as tk from tkr group by k with rollup "
        "order by k nulls first"
    ).collect()
    got = [(r["k"], r["tk"]) for r in rows]
    # the grand-total row aggregates across keys: v=1 has 6 ≥ v=0's 3
    assert got == [(None, [1]), ("a", [0]), ("b", [1])]


def test_group_array_sorted_two_level(spark, eng):
    # groupArraySorted rides the same bounded rewrite: one hot group,
    # 40k rows, 7 distinct values — level 1 shrinks to 7 rows, the
    # running-count window keeps the rows reaching into the first n,
    # array_repeat rebuilds duplicates
    df = spark.range(40_000).selectExpr(
        "'hot' as k", "cast(id % 7 as int) as v"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "hotg" else real(n)
    out = eng.sql(
        "select k, groupArraySorted(9)(v) as gs, count(*) as n "
        "from hotg group by k"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    r = out.collect()[0]
    # 0 appears 5715 times: the first 9 elements are all zeros... no:
    # 0 appears 5715 >= 9, so first 9 are nine 0s
    assert r["gs"] == [0] * 9 and r["n"] == 40_000


def test_group_array_sorted_duplicates_and_boundary(spark, eng):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 1), ("a", 2), ("a", 2), ("b", 5)],
        "k string, v int",
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "t6" else real(n)
    out = {
        r["k"]: r["gs"]
        for r in eng.sql(
            "select k, groupArraySorted(4)(v) as gs from t6 group by k"
        ).collect()
    }
    # duplicates included, cut mid-value-run at n=4
    assert out["a"] == [1, 1, 2, 2]
    assert out["b"] == [5]


def test_group_array_sorted_matches_fallback(spark, eng):
    # the two-level rewrite must agree with the in-group sort+slice
    # (used in window position) on the same data
    import pyspark.sql.functions as F

    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    df = spark.range(500).selectExpr(
        "cast(id % 3 as int) as k", "cast((id * 37) % 23 as int) as v"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "t500" else real(n)
    got = {
        r["k"]: r["gs"]
        for r in eng.sql(
            "select k, groupArraySorted(7)(v) as gs from t500 group by k"
        ).collect()
    }
    want = {
        r["k"]: r["gs"]
        for r in df.groupBy("k")
        .agg(PARAMETRIC_AGGS["groupArraySorted"]([7], F.col("v")).alias("gs"))
        .collect()
    }
    assert got == want


def test_group_array_sorted_global_and_rollup(spark, eng):
    df = spark.createDataFrame(
        [("x", 4), ("x", 2), ("y", 3), ("y", 1)], "k string, v int"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "t4" else real(n)
    g = eng.sql("select groupArraySorted(3)(v) as gs from t4").collect()
    assert g[0]["gs"] == [1, 2, 3]
    rows = eng.sql(
        "select k, grouping(k) as g, groupArraySorted(2)(v) as gs "
        "from t4 group by rollup(k) order by g, k"
    ).collect()
    by = {(r["k"], r["g"]): r["gs"] for r in rows}
    assert by[("x", 0)] == [2, 4] and by[("y", 0)] == [1, 3]
    assert by[(None, 1)] == [1, 2]  # grand total from the shared pre-agg


def test_quantile_exact_two_level(spark, eng):
    # histogram-based exact quantile: one hot group, 40k rows, 7
    # distinct values — the side frame carries 7 rows, never 40k
    df = spark.range(40_000).selectExpr(
        "'hot' as k", "cast(id % 7 as int) as v"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "hotq" else real(n)
    out = eng.sql(
        "select k, quantileExactLow(0.5)(v) as m, "
        "quantileExactHigh(0.999)(v) as hi, count(*) as n "
        "from hotq group by k"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    r = out.collect()[0]
    assert r["m"] == 3 and r["hi"] == 6 and r["n"] == 40_000


def test_quantile_exact_low_high_and_fallback(spark, eng):
    import math

    import pyspark.sql.functions as F

    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    df = spark.range(501).selectExpr(
        "cast(id % 2 as int) as k", "cast((id * 37) % 101 as int) as v"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "tq" else real(n)
    for level in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = {
            r["k"]: (r["lo"], r["hi"])
            for r in eng.sql(
                f"select k, quantileExactLow({level})(v) as lo, "
                f"quantileExactHigh({level})(v) as hi "
                "from tq group by k"
            ).collect()
        }
        want_rows = df.collect()
        for kk in (0, 1):
            vs = sorted(r["v"] for r in want_rows if r["k"] == kk)
            lo = vs[math.floor(level * (len(vs) - 1))]
            hi = vs[math.ceil(level * (len(vs) - 1))]
            assert got[kk] == (lo, hi), (level, kk)
    # the in-group fallback (window position path) agrees
    fb = df.groupBy("k").agg(
        PARAMETRIC_AGGS["quantileExactLow"]([0.5], F.col("v")).alias("m")
    )
    got = {
        r["k"]: r["m"]
        for r in eng.sql(
            "select k, quantileExactLow(0.5)(v) as m from tq group by k"
        ).collect()
    }
    assert {r["k"]: r["m"] for r in fb.collect()} == got


def test_quantile_exact_all_null_group_is_null(spark, eng):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", None)], "k string, v int"
    )
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "tn" else real(n)
    rows = {
        r["k"]: r["m"]
        for r in eng.sql(
            "select k, quantileExactLow(0.5)(v) as m from tn group by k"
        ).collect()
    }
    assert rows == {"a": 1, "b": None}


def test_parametric_if_equals_prefiltered(eng):
    """topKIf/quantileExactIf under GROUP BY must equal the
    unconditioned aggregate over a pre-filtered input, and the plan
    must stay collect_list-free (the bounded rewrite, not the
    fallback)."""
    a = eng.sql(
        "select l_returnflag as k, "
        "topKIf(2)(l_linestatus, l_quantity > 25) as t, "
        "quantileExactIf(0.5)(l_suppkey, l_quantity > 25) as q "
        "from lineitem group by l_returnflag order by l_returnflag"
    )
    b = eng.sql(
        "select l_returnflag as k, topK(2)(l_linestatus) as t, "
        "quantileExact(0.5)(l_suppkey) as q "
        "from (select * from lineitem where l_quantity > 25) "
        "group by l_returnflag order by l_returnflag"
    )
    assert [tuple(r) for r in a.collect()] == [
        tuple(r) for r in b.collect()
    ]
    plan = a._jdf.queryExecution().executedPlan().toString()
    # the bounded two-level rewrite's generated level-1 columns prove
    # the rewrite (not the in-group fallback) served the -If form;
    # its only collect_list folds the <=k survivor rows per key
    assert "__tkv" in plan
