"""`* APPLY(fn)` / `COLUMNS('re') APPLY(fn)` select-list modifier
(ClickHouse). Parse-shape asserts first (keyword traps bite silently),
then values, then the expansion-before-aggregation property."""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend.parser import parse


def test_parse_star_apply_chain():
    q = parse("SELECT * APPLY(abs) APPLY(sum) FROM t").query
    (e, alias), = q.columns
    assert isinstance(e, A.Wildcard) and e.applies == ["abs", "sum"]


def test_parse_except_then_apply():
    q = parse("SELECT * EXCEPT (a) APPLY(max) FROM t").query
    (e, _), = q.columns
    assert e.except_cols == ["a"] and e.applies == ["max"]


def test_parse_columns_apply():
    q = parse("SELECT COLUMNS('^n_') APPLY(sum) FROM t").query
    (e, _), = q.columns
    assert isinstance(e, A.FnCall) and e.name.lower() == "columns"
    assert e.applies == ["sum"]


def test_parse_apply_without_parens_is_not_modifier():
    # `apply` as a plain identifier keeps working
    q = parse("SELECT apply FROM t").query
    assert isinstance(q.columns[0][0], A.Ident)


@pytest.fixture()
def eng(spark, sf_dir):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def test_apply_aggregate_matches_explicit(eng):
    got = eng.sql(
        "select n_regionkey, COLUMNS('n_nationkey') APPLY(sum) "
        "from nation group by n_regionkey order by n_regionkey"
    )
    assert got.columns == ["n_regionkey", "sum(n_nationkey)"]
    want = eng.sql(
        "select n_regionkey, sum(n_nationkey) as s "
        "from nation group by n_regionkey order by n_regionkey"
    ).collect()
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want]


def test_apply_chain_names_and_values(eng):
    df = eng.sql(
        "select * APPLY(abs) APPLY(toInt64) from (select -1 as a, -2 as b)"
    )
    assert df.columns == ["toInt64(abs(a))", "toInt64(abs(b))"]
    assert [tuple(r) for r in df.collect()] == [(1, 2)]


def test_apply_expands_into_single_aggregate_plan(eng):
    # expansion happens before hoisting: ONE HashAggregate, no
    # post-aggregation Python or second pass
    df = eng.sql(
        "select l_returnflag, COLUMNS('l_quantity') APPLY(sum) "
        "from lineitem group by l_returnflag"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the one groupBy shuffle
    assert "BatchEvalPython" not in plan


def test_apply_with_replace_rejected(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="REPLACE"):
        eng.sql(
            "select * REPLACE (n_nationkey + 1 AS n_nationkey) "
            "APPLY(max) from nation"
        ).collect()


def test_apply_composes_with_group_by_all_and_ordinals(eng):
    # GROUP BY ALL sees POST-expansion items (applied aggregates are
    # excluded from keys; applied scalars become keys), and positional
    # ordinals address the final output column list
    df = eng.sql(
        "select COLUMNS('n_regionkey') APPLY(toInt64), count(*) as n "
        "from nation group by all order by 1"
    )
    assert df.columns == ["toInt64(n_regionkey)", "n"]
    assert [tuple(r) for r in df.collect()][:2] == [(0, 5), (1, 5)]
    df2 = eng.sql(
        "select n_regionkey, COLUMNS('n_nationkey') APPLY(sum) "
        "from nation group by all order by n_regionkey"
    )
    assert df2.columns == ["n_regionkey", "sum(n_nationkey)"]


def test_order_by_all_rejects_columns_carrier(eng):
    from nutdb_spark.frontend.parser import ParseError, parse

    with pytest.raises(ParseError, match="explicit select list"):
        parse("select COLUMNS('n_') APPLY(sum) from nation order by all")
