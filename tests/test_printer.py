"""AST→SQL printer round-trips: parse(print(parse(q))) must lower to
the SAME result frame as q itself (fidelity, not byte identity), and
unprintable clauses fall back loudly instead of emitting wrong SQL.
Also drives EXPLAIN SYNTAX and the re-executable SHOW CREATE VIEW.
"""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.parser import parse
from nutdb_spark.frontend.printer import Unprintable, query as print_q


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


ROUNDTRIP = [
    "select l_returnflag, l_linestatus, count() as n from lineitem "
    "group by l_returnflag, l_linestatus with rollup "
    "order by l_returnflag nulls first, l_linestatus nulls first",
    "select l_orderkey, l_linenumber from lineitem "
    "order by l_orderkey, l_linenumber limit 2 by l_orderkey "
    "limit 10",
    "select l_orderkey, row_number() over (order by l_orderkey) as rn "
    "from lineitem qualify rn <= 5",
    "select count() as n from lineitem sample 0.5 by (l_orderkey)",
    "select l_linenumber as x, count() as n from lineitem "
    "where l_linenumber <= 3 group by x "
    "order by x with fill from 1 to 8",
    "select l_returnflag, count() as n, sum(l_quantity) as q "
    "from lineitem where l_quantity > 30 group by l_returnflag "
    "having count() > 10 order by l_returnflag",
    "select o.o_orderkey, l.l_quantity from orders as o "
    "join lineitem as l on o.o_orderkey = l.l_orderkey "
    "where o.o_orderkey < 100 order by o.o_orderkey, l.l_quantity "
    "limit 20",
    "with big as (select * from lineitem where l_quantity > 45) "
    "select count() as n from big",
    "select distinct l_returnflag, l_linestatus from lineitem "
    "order by l_returnflag, l_linestatus",
    "select l_orderkey, row_number() over (partition by l_returnflag "
    "order by l_orderkey) as rn from lineitem order by l_orderkey "
    "limit 10",
    "select count() as n from lineitem "
    "where l_orderkey in (select o_orderkey from orders "
    "where o_orderkey < 50)",
    "select case when l_quantity > 25 then 'hi' else 'lo' end as b, "
    "count() as n from lineitem group by b order by b",
    "select arrayMap(x -> x * 2, [1, 2, 3]) as a from numbers(1)",
    "select cast(l_quantity as Int64) as q from lineitem "
    "order by l_orderkey limit 5",
    "select count() as n from (select l_returnflag as v from lineitem "
    "union distinct select l_linestatus from lineitem)",
]


@pytest.mark.parametrize("sql", ROUNDTRIP)
def test_print_roundtrip_same_result(eng, sql):
    printed = print_q(parse(sql).query)
    a = [tuple(r) for r in eng.sql(sql).collect()]
    b = [tuple(r) for r in eng.sql(printed).collect()]
    assert sorted(map(str, a)) == sorted(map(str, b)), printed


def test_unprintable_falls_back_loudly():
    # the loud-fallback contract: a non-SelectCore node (here the full
    # statement wrapper) raises instead of emitting wrong SQL
    with pytest.raises(Unprintable):
        print_q(parse("select 1"))


# round-8 gaps, now closed: these clauses print and re-parse
CLOSED_GAPS = [
    "select l_linenumber as x, max(l_quantity) as q from lineitem "
    "group by x order by x with fill from 1 to 9 interpolate (q)",
    "select l_returnflag, l_linestatus, count() as n from lineitem "
    "group by grouping sets ((l_returnflag, l_linestatus), "
    "(l_returnflag), ()) order by n",
    "with recursive seq as (select 1 as n union all "
    "select n + 1 as n from seq where n < 5) select n from seq",
    "with 7 as lucky select l_orderkey + lucky as x from lineitem "
    "order by x limit 3",
    "select v.a, v.b from (values (1, 'x'), (2, null)) as v(a, b)",
    "select l_orderkey, tag from lineitem "
    "array join ['a', 'b'] as tag where l_orderkey < 3",
    "select l_orderkey, sum(l_quantity) over w as s from lineitem "
    "window w as (partition by l_orderkey) order by l_orderkey, s "
    "limit 10",
    "select l_returnflag, columns('l_quantity|l_tax') apply(sum) "
    "from lineitem group by l_returnflag order by l_returnflag",
    "select count() as n from nation as a join nation as b "
    "on a.n_name is distinct from b.n_name",
]


@pytest.mark.parametrize("sql", CLOSED_GAPS)
def test_closed_gaps_roundtrip(eng, sql):
    printed = print_q(parse(sql).query)
    a = [tuple(r) for r in eng.sql(sql).collect()]
    b = [tuple(r) for r in eng.sql(printed).collect()]
    assert sorted(map(str, a)) == sorted(map(str, b)), printed


def test_whole_suite_roundtrip_property(spark, sf_dir):
    """VERDICT r8 #2: for EVERY sql_* suite entry, each dialect SELECT
    it executes must parse→print→re-parse→execute to the identical
    result frame — and after the round-9 gap closures, NONE may raise
    Unprintable (the printer covers the whole graded dialect surface).
    """
    from nutdb_spark.frontend import ast_nodes as A
    from nutdb_spark.suite import QUERIES

    orig = NutEngine.sql
    captured: list = []

    def capturing(self, text, params=None):
        captured.append((self, text, params))
        return orig(self, text, params)

    unprintable, mismatches = [], []
    for name, fn in QUERIES.items():
        if not name.startswith("sql_"):
            continue
        captured.clear()
        NutEngine.sql = capturing
        try:
            fn(spark, sf_dir).collect()
        finally:
            NutEngine.sql = orig
        for e, text, params in list(captured):
            stmt = parse(text)
            if not isinstance(stmt, A.SelectStmt):
                continue  # DDL/SET drive SHOW CREATE, not the printer
            try:
                printed = print_q(stmt.query)
            except Unprintable as ex:
                unprintable.append((name, str(ex)))
                continue
            a = [tuple(r) for r in orig(e, text, params).collect()]
            b = [tuple(r) for r in orig(e, printed, params).collect()]
            if sorted(map(str, a)) != sorted(map(str, b)):
                mismatches.append((name, printed[:160]))
    assert not mismatches, mismatches
    assert not unprintable, unprintable


def test_explain_syntax(eng):
    out = eng.sql(
        "explain syntax select l_orderkey from lineitem "
        "where l_quantity > 30"
    ).first()["syntax"]
    assert out.startswith("SELECT l_orderkey FROM lineitem WHERE")
    # the printed text itself runs
    assert eng.sql(out).count() > 0


def test_show_create_view_reexecutable(eng):
    eng.sql(
        "create view pvq as select l_returnflag, count() as n "
        "from lineitem group by l_returnflag"
    )
    ddl = eng.sql("show create table pvq").first()["create_query"]
    assert "<stored query>" not in ddl
    inner = ddl.split(" AS ", 1)[1]
    a = sorted(tuple(r) for r in eng.sql(inner).collect())
    b = sorted(tuple(r) for r in eng.sql("select * from pvq").collect())
    assert a == b


# --- round-13: MERGE INTO through the printer --------------------------------

MERGE_STATEMENTS = [
    # the q_ddl_merge_into flagship statement verbatim
    "MERGE INTO merge_t AS t USING merge_s AS s ON t.id = s.id "
    "WHEN MATCHED AND s.tag = 'x' THEN DELETE "
    "WHEN MATCHED THEN UPDATE SET v = s.v + t.v, tag = s.tag "
    "WHEN NOT MATCHED AND s.tag != 'skip' THEN "
    "INSERT (id, tag, v) VALUES (s.id, s.tag, s.v)",
    # the q_ddl_merge_sync full-sync form (NOT MATCHED BY SOURCE)
    "MERGE INTO merge_t AS t USING merge_s AS s ON t.id = s.id "
    "WHEN MATCHED THEN UPDATE SET v = s.v "
    "WHEN NOT MATCHED THEN INSERT (id, tag, v) "
    "VALUES (s.id, s.tag, s.v) "
    "WHEN NOT MATCHED BY SOURCE AND t.tag = 'b' THEN DELETE "
    "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'",
    # subquery source, bare INSERT VALUES (no column list)
    "MERGE INTO merge_t USING "
    "(SELECT id, tag, v FROM merge_s WHERE v > 5) AS s "
    "ON merge_t.id = s.id "
    "WHEN MATCHED THEN DELETE "
    "WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.tag, s.v)",
]


@pytest.mark.parametrize("sql", MERGE_STATEMENTS)
def test_merge_print_is_fixed_point(sql):
    """print(parse(m)) must re-parse to a tree that prints to the
    IDENTICAL string (a fixed point ⇒ nothing is lost or reordered),
    with zero Unprintable across every MERGE clause shape."""
    from nutdb_spark.frontend.printer import statement

    printed = statement(parse(sql))
    again = statement(parse(printed))
    assert printed == again
    assert printed.startswith("MERGE INTO")


def test_merge_printed_text_executes_identically(eng):
    """The printed MERGE applies the same mutation as the original."""
    from nutdb_spark.frontend.printer import statement

    def setup():
        eng.sql("DROP TABLE IF EXISTS merge_t")
        eng.sql("DROP TABLE IF EXISTS merge_s")
        eng.sql("CREATE TABLE merge_t (id Int64, tag String, v Int64)")
        eng.sql(
            "INSERT INTO merge_t (id, tag, v) VALUES "
            "(1, 'a', 10), (2, 'b', 20), (3, 'a', 30), (5, 'b', 50)"
        )
        eng.sql("CREATE TABLE merge_s (id Int64, tag String, v Int64)")
        eng.sql(
            "INSERT INTO merge_s (id, tag, v) VALUES "
            "(2, 'b', 99), (3, 'x', 7), (4, 'c', 40), (6, 'skip', 6)"
        )

    stmt = MERGE_STATEMENTS[0]
    setup()
    eng.sql(stmt)
    a = sorted(tuple(r) for r in eng.sql("SELECT * FROM merge_t").collect())
    setup()
    eng.sql(statement(parse(stmt)))
    b = sorted(tuple(r) for r in eng.sql("SELECT * FROM merge_t").collect())
    assert a == b


def test_explain_syntax_merge(eng):
    eng.sql("DROP TABLE IF EXISTS merge_t")
    eng.sql("DROP TABLE IF EXISTS merge_s")
    eng.sql("CREATE TABLE merge_t (id Int64, v Int64)")
    eng.sql("CREATE TABLE merge_s (id Int64, v Int64)")
    out = eng.sql(
        "explain syntax merge into merge_t using merge_s "
        "on merge_t.id = merge_s.id "
        "when matched then update set v = merge_s.v "
        "when not matched then insert (id, v) "
        "values (merge_s.id, merge_s.v)"
    ).first()["syntax"]
    assert out.startswith("MERGE INTO merge_t USING merge_s")
    assert "<stored query>" not in out
    # executing modes stay query-only — loud, not silent
    from nutdb_spark.frontend.parser import ParseError

    with pytest.raises(ParseError, match="SYNTAX and AST"):
        parse("explain formatted merge into t using s on t.id = s.id "
              "when matched then delete")


def test_explain_ast_merge(eng):
    rows = eng.sql(
        "explain ast merge into merge_t using merge_s "
        "on merge_t.id = merge_s.id "
        "when matched then delete"
    ).collect()
    text = "\n".join(r[0] for r in rows)
    assert "MergeStmt" in text
