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


def test_unprintable_clauses_raise():
    for sql in (
        "select l_linenumber as x, max(l_quantity) as q from lineitem "
        "group by x order by x with fill from 1 to 9 "
        "interpolate (q)",
        "select count() from lineitem "
        "group by grouping sets ((l_returnflag), ())",
    ):
        with pytest.raises(Unprintable):
            print_q(parse(sql).query)


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
