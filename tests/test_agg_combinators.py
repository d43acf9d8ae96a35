"""Pins for the -Array / -Distinct / -OrNull / -OrDefault combinator
families (functions/registry.py combinator section): empty/NULL array
handling, null-element skipping, the agg-over-agg emptiness guard,
and the -If compositions — the edges the suite entry's fixture data
doesn't isolate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nutdb_spark.functions.registry import AGGREGATE_FNS as A


@pytest.fixture(scope="module")
def adf(spark):
    return spark.createDataFrame(
        [
            (1, [1, 2, None], 3),
            (1, [2, 4], 5),
            (1, None, 3),
            (2, [], 7),
        ],
        "g int, a array<int>, x int",
    )


def _agg(df, col):
    rows = df.groupBy("g").agg(col.alias("v")).orderBy("g").collect()
    return [r["v"] for r in rows]


def test_array_family_null_and_empty(adf):
    # null elements skipped; NULL/empty arrays contribute nothing
    assert _agg(adf, A["sumArray"](F.col("a"))) == [9, None]
    assert _agg(adf, A["minArray"](F.col("a"))) == [1, None]
    assert _agg(adf, A["maxArray"](F.col("a"))) == [4, None]
    assert _agg(adf, A["countArray"](F.col("a"))) == [4, 0]
    assert _agg(adf, A["avgArray"](F.col("a"))) == [2.25, None]
    assert _agg(adf, A["uniqExactArray"](F.col("a"))) == [3, 0]
    assert _agg(adf, A["groupUniqArrayArray"](F.col("a"))) == [
        [1, 2, 4],
        [],
    ]


def test_array_sum_preserves_element_type(adf):
    out = adf.groupBy("g").agg(A["sumArray"](F.col("a")).alias("v"))
    assert dict(out.dtypes)["v"] == "bigint"  # int fold, no double


def test_distinct_family(adf):
    assert _agg(adf, A["sumDistinct"](F.col("x"))) == [8, 7]
    assert _agg(adf, A["countDistinct"](F.col("x"))) == [2, 1]
    assert _agg(adf, A["avgDistinct"](F.col("x"))) == [4.0, 7.0]
    assert _agg(adf, A["groupArrayDistinct"](F.col("x"))) == [
        [3, 5],
        [7],
    ]


def test_ornull_ordefault_guards(adf):
    never = F.col("x") > 100
    some = F.col("x") >= 5
    assert _agg(adf, A["sumOrNull"](F.col("x"))) == [11, 7]
    assert _agg(adf, A["sumOrNullIf"](F.col("x"), never)) == [None, None]
    assert _agg(adf, A["sumOrNullIf"](F.col("x"), some)) == [5, 7]
    assert _agg(adf, A["sumOrDefaultIf"](F.col("x"), never)) == [0, 0]
    assert _agg(adf, A["countOrNullIf"](F.col("x"), never)) == [
        None,
        None,
    ]
    assert _agg(adf, A["countOrNullIf"](F.col("x"), some)) == [1, 1]
    assert _agg(adf, A["uniqExactOrDefaultIf"](F.col("x"), never)) == [
        0,
        0,
    ]
    assert _agg(adf, A["anyOrNullIf"](F.col("x"), never)) == [
        None,
        None,
    ]


def test_array_if_composition(adf):
    cond = F.col("x") > 3
    assert _agg(adf, A["sumArrayIf"](F.col("a"), cond)) == [6, None]
    assert _agg(adf, A["countArrayIf"](F.col("a"), cond)) == [2, 0]


def test_single_hash_aggregate_plan(adf):
    """The OrNull guard's two accumulators must plan into ONE
    HashAggregate pair (partial + final) — no extra Exchange beyond
    the group-by shuffle."""
    out = adf.groupBy("g").agg(
        A["sumOrNull"](F.col("x")).alias("a"),
        A["sumArray"](F.col("a")).alias("b"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_uniq_sketch_spellings(spark, sf_dir):
    import tempfile

    from nutdb_spark.engine import NutEngine

    eng = NutEngine(
        spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp()
    )
    r = eng.sql(
        "select uniqHLL12(l_partkey) as a, uniqTheta(l_partkey) as b, "
        "uniqExact(l_partkey) as x from lineitem"
    ).first()
    assert abs(r["a"] - r["x"]) / r["x"] < 0.05
    assert r["a"] == r["b"]
