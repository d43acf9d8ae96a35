"""GROUP BY ALL / ORDER BY ALL (ClickHouse 22.12+/23.12+, DuckDB).

Parse-SHAPE asserts first (the `_opt_alias`/keyword traps bite
silently — a mis-read returns right rows on small data), then value
behavior, then the column-named-`all` precedence edges."""

from __future__ import annotations

import pytest

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend.parser import ParseError, parse


# --- parse shape -----------------------------------------------------------


def test_group_by_all_sets_marker_not_ident():
    q = parse("SELECT a, count(*) FROM t GROUP BY ALL").query
    assert q.group_all is True
    assert q.group_by == []  # expansion happens at lowering


def test_order_by_all_expands_to_ordinals():
    q = parse("SELECT a, b FROM t ORDER BY ALL").query
    assert [(o.expr.value, o.asc) for o in q.order_by] == [(1, True), (2, True)]


def test_order_by_all_desc_nulls_last():
    q = parse("SELECT a, b FROM t ORDER BY ALL DESC NULLS LAST").query
    assert [(o.expr.value, o.asc, o.nulls) for o in q.order_by] == [
        (1, False, "last"),
        (2, False, "last"),
    ]


def test_group_by_all_then_other_clauses_parse():
    q = parse(
        "SELECT a, count(*) AS n FROM t GROUP BY ALL "
        "HAVING count(*) > 1 ORDER BY ALL LIMIT 3"
    ).query
    assert q.group_all and q.having is not None and q.limit is not None


def test_column_named_all_still_usable_in_expressions():
    # `all` only reads as the modifier when nothing after it can
    # continue an expression — these are all column references
    q = parse("SELECT x FROM t GROUP BY all + 1").query
    assert q.group_all is False and len(q.group_by) == 1
    q = parse("SELECT x FROM t GROUP BY all, y").query
    assert q.group_all is False and len(q.group_by) == 2
    q = parse("SELECT x FROM t ORDER BY all.v").query
    assert isinstance(q.order_by[0].expr, A.Ident)


def test_order_by_all_rejects_wildcard_select():
    with pytest.raises(ParseError, match="explicit select list"):
        parse("SELECT * FROM t ORDER BY ALL")


# --- values ----------------------------------------------------------------


@pytest.fixture()
def eng(spark, sf_dir):
    import tempfile

    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def test_group_by_all_matches_explicit(eng):
    got = eng.sql(
        "select n_regionkey, n_nationkey % 2 as par, count(*) as n "
        "from nation group by all order by all"
    ).collect()
    want = eng.sql(
        "select n_regionkey, n_nationkey % 2 as par, count(*) as n "
        "from nation group by n_regionkey, n_nationkey % 2 "
        "order by 1, 2, 3"
    ).collect()
    assert got == want


def test_group_by_all_only_aggregates_raises(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="no non-aggregate"):
        eng.sql("select count(*) from nation group by all").collect()


# --- ANSI GROUP BY ROLLUP (…) / CUBE (…) spellings -------------------------


def test_ansi_rollup_cube_spellings_parse():
    q = parse("SELECT a, count(*) FROM t GROUP BY ROLLUP (a, b)").query
    assert q.group_modifier == "rollup" and len(q.group_by) == 2
    q = parse("SELECT a, count(*) FROM t GROUP BY CUBE (a)").query
    assert q.group_modifier == "cube" and len(q.group_by) == 1


def test_ansi_rollup_values_match_with_rollup(eng):
    a = eng.sql(
        "select n_regionkey as k, count(*) as n from nation "
        "group by rollup (n_regionkey) order by k nulls first"
    ).collect()
    b = eng.sql(
        "select n_regionkey as k, count(*) as n from nation "
        "group by n_regionkey with rollup order by k nulls first"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --- [EXT] GROUP BY <select alias> -----------------------------------------


def test_group_by_select_alias_plain(eng):
    rows = eng.sql(
        "select l_returnflag as rf, count() as n from lineitem "
        "group by rf order by rf"
    ).collect()
    direct = eng.sql(
        "select l_returnflag as rf, count() as n from lineitem "
        "group by l_returnflag order by l_returnflag"
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in direct]


def test_group_by_select_alias_expression_and_rollup(eng):
    rows = eng.sql(
        "select l_suppkey % 3 as m, count() as n from lineitem "
        "group by m with rollup order by m nulls first"
    ).collect()
    assert rows[0]["m"] is None  # grand total present
    assert rows[0]["n"] == sum(r["n"] for r in rows[1:])


def test_group_by_alias_bounded_rewrite_paths(eng):
    rows = eng.sql(
        "select l_suppkey % 3 as m, topK(2)(l_linestatus) as t, "
        "entropy(l_linestatus) as h from lineitem group by m order by m"
    ).collect()
    assert len(rows) == 3 and all(len(r["t"]) == 2 for r in rows)


def test_group_by_alias_column_precedence(eng):
    """A REAL source column of the same name wins over the alias —
    existing queries keep their meaning (ClickHouse prefers the
    alias; we take the safer choice). Consequence: aliasing a
    DIFFERENT column to a real column's name and grouping by that
    name groups by the REAL column, leaving the select item
    ungrouped — an analysis error, not a silent regroup."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        eng.sql(
            "select l_returnflag as l_linestatus, count() as n "
            "from lineitem group by l_linestatus order by n"
        ).collect()


def test_group_by_alias_of_aggregate_rejected(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="names an aggregate"):
        eng.sql(
            "select sum(l_quantity) as s from lineitem group by s"
        )


def test_having_select_alias(eng):
    rows = eng.sql(
        "select l_returnflag as rf, count() as n from lineitem "
        "group by rf having n > 1000 and rf != 'A' order by rf"
    ).collect()
    direct = eng.sql(
        "select l_returnflag as rf, count() as n from lineitem "
        "group by l_returnflag "
        "having count() > 1000 and l_returnflag != 'A' "
        "order by l_returnflag"
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in direct]


def test_having_real_column_not_hijacked_by_alias(eng):
    """An alias that shadows a REAL column name must not capture a
    HAVING reference to that column — ungrouped real columns in
    HAVING stay an analysis error, never a silent alias rebind."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        eng.sql(
            "select count() as l_orderkey from lineitem "
            "group by l_returnflag having l_orderkey > 0"
        ).collect()


def test_where_select_alias(eng):
    rows = eng.sql(
        "select l_quantity * (1 - l_discount) as net, l_orderkey "
        "from lineitem where net > 49 order by l_orderkey limit 2"
    ).collect()
    assert rows and all(r["net"] > 49 for r in rows)


def test_where_alias_predicate_pushes_to_scan(eng):
    df = eng.sql(
        "select l_suppkey % 7 as b, l_orderkey from lineitem "
        "where b = 2"
    )
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters" in plan


def test_where_alias_of_aggregate_fails_loudly(eng):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        eng.sql(
            "select sum(l_quantity) as s from lineitem where s > 0"
        ).collect()


def test_where_real_column_wins_over_alias(eng):
    rows = eng.sql(
        "select l_partkey as l_orderkey, count(*) as n from lineitem "
        "where l_orderkey < 5 group by l_partkey"
    ).collect()
    # filtered on the REAL l_orderkey (< 5), not the aliased partkey
    direct = eng.sql(
        "select count(*) as n from lineitem where l_orderkey < 5"
    ).first()["n"]
    assert sum(r["n"] for r in rows) == direct
