"""Round-6 late dialect extensions: PREWHERE, GROUPING SETS,
LIMIT ... BY, and the named WINDOW clause — parse shapes, scoping,
lowering semantics, and the failure branches.
"""

from __future__ import annotations

import pytest

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend.parser import ParseError, parse

SF = "/root/testdata/sf0.001"


def _eng(spark):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=SF)


# --- parse shapes ----------------------------------------------------------


def test_prewhere_parses_before_where():
    q = parse("select 1 from t prewhere a > 1 where b < 2").query
    assert q.prewhere is not None and q.where is not None
    assert isinstance(q.prewhere, A.BinOp) and q.prewhere.op == ">"


def test_prewhere_alone():
    q = parse("select 1 from t prewhere a > 1").query
    assert q.prewhere is not None and q.where is None


def test_prewhere_wrong_order_rejected():
    # PREWHERE must precede WHERE (ClickHouse clause order)
    with pytest.raises(ParseError):
        parse("select 1 from t where b < 2 prewhere a > 1")


def test_grouping_sets_indexes_and_union():
    q = parse(
        "select 1 from t group by grouping sets ((a, b), (b), a, ())"
    ).query
    # ordered union: a, b; sets as indexes incl. bare single-expr + empty
    assert [g.name for g in q.group_by] == ["a", "b"]
    assert q.group_sets == [[0, 1], [1], [0], []]


def test_grouping_sets_requires_parens():
    with pytest.raises(ParseError):
        parse("select 1 from t group by grouping sets a, b")


def test_limit_by_shapes():
    q = parse(
        "select a from t order by a limit 2 by k1, k2 limit 10"
    ).query
    assert isinstance(q.limit_by, A.LimitBy)
    assert len(q.limit_by.keys) == 2 and q.limit_by.offset is None
    assert q.limit is not None  # the trailing combined LIMIT survives
    q2 = parse("select a from t order by a limit 1, 2 by k").query
    assert q2.limit_by.offset is not None and q2.limit is None


def test_limit_with_ties_rejects_by():
    with pytest.raises(ParseError):
        parse("select a from t order by a limit 2 with ties by k")


def test_named_window_parses_and_patches():
    q = parse(
        "select row_number() over w as rn from t "
        "window w as (partition by k order by a desc)"
    ).query
    wc = q.columns[0][0]
    assert isinstance(wc, A.WindowCall) and wc.ref == "w"
    assert [p.name for p in wc.partition_by] == ["k"]
    assert wc.order_by[0].asc is False


def test_named_window_unknown_ref():
    with pytest.raises(ParseError, match="unknown window"):
        parse("select row_number() over w from t")


def test_named_window_subquery_scoping():
    # the inner body's WINDOW clause must not capture (or error on)
    # the outer body's `over w`, and vice versa
    q = parse(
        "select row_number() over w as rn, "
        "(select count(*) from u) as c from t "
        "window w as (order by a)"
    ).query
    assert q.columns[0][0].order_by[0].expr.name == "a"
    with pytest.raises(ParseError, match="unknown window"):
        parse(
            "select (select row_number() over w from u) as c from t "
            "window w as (order by a)"
        )


def test_named_window_ref_in_order_by():
    q = parse(
        "select a from t window w as (order by a) "
        "order by row_number() over w"
    ).query
    assert q.order_by[0].expr.order_by[0].expr.name == "a"


def test_window_not_eaten_as_alias():
    q = parse("select a from t window w as (order by a)").query
    assert q.from_.alias is None and len(q.windows) == 1


# --- lowering semantics ----------------------------------------------------


def test_prewhere_matches_single_where(spark):
    eng = _eng(spark)
    a = eng.sql(
        "select count(*) as n from lineitem "
        "prewhere l_quantity > 25 where l_discount < 0.05"
    ).collect()[0]["n"]
    b = eng.sql(
        "select count(*) as n from lineitem "
        "where l_quantity > 25 and l_discount < 0.05"
    ).collect()[0]["n"]
    assert a == b > 0


def test_grouping_sets_matches_spark_sql(spark):
    eng = _eng(spark)
    got = eng.sql(
        "select l_returnflag, l_linestatus, count(*) as n from lineitem "
        "group by grouping sets ((l_returnflag, l_linestatus), "
        "(l_linestatus), ())"
    )
    spark.read.parquet(f"{SF}/lineitem.parquet").createOrReplaceTempView(
        "li_gs"
    )
    want = spark.sql(
        "select l_returnflag, l_linestatus, count(*) as n from li_gs "
        "group by grouping sets ((l_returnflag, l_linestatus), "
        "(l_linestatus), ())"
    )
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_grouping_sets_expression_key(spark):
    rows = _eng(spark).sql(
        "select getYear(l_shipdate) as y, count(*) as n from lineitem "
        "group by grouping sets ((getYear(l_shipdate)), ()) order by y"
    ).collect()
    # Spark sorts NULL first ascending → grand-total row leads
    assert rows[0]["y"] is None
    assert sum(r["n"] for r in rows[1:]) == rows[0]["n"]


def test_limit_by_per_key_head(spark):
    rows = _eng(spark).sql(
        "select l_returnflag, l_orderkey, count(*) as n from lineitem "
        "group by l_returnflag, l_orderkey "
        "order by n desc, l_orderkey, l_returnflag limit 2 by l_returnflag"
    ).collect()
    per_key: dict[str, int] = {}
    for r in rows:
        per_key[r["l_returnflag"]] = per_key.get(r["l_returnflag"], 0) + 1
    assert set(per_key.values()) == {2} and len(per_key) == 3


def test_limit_by_offset_skips_first(spark):
    eng = _eng(spark)
    head2 = eng.sql(
        "select l_returnflag, l_orderkey, count(*) as n from lineitem "
        "group by l_returnflag, l_orderkey "
        "order by n desc, l_orderkey, l_returnflag limit 2 by l_returnflag"
    ).collect()
    second = eng.sql(
        "select l_returnflag, l_orderkey, count(*) as n from lineitem "
        "group by l_returnflag, l_orderkey "
        "order by n desc, l_orderkey, l_returnflag limit 1, 1 by l_returnflag"
    ).collect()
    want = {
        (r["l_returnflag"], r["l_orderkey"])
        for r in sorted(
            head2, key=lambda r: (-r["n"], r["l_orderkey"], r["l_returnflag"])
        )
    }
    got = {(r["l_returnflag"], r["l_orderkey"]) for r in second}
    assert got < want and len(got) == 3


def test_limit_by_requires_order_by(spark):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="ORDER BY"):
        _eng(spark).sql("select l_returnflag from lineitem limit 2 by l_returnflag")


def test_named_window_shares_one_windowexec(spark):
    df = _eng(spark).sql(
        "select user_id, event_id, row_number() over w as rn, "
        "lag(event_id, 1) over w as prev_id from events "
        "where user_id < 5 window w as (partition by user_id "
        "order by ts, event_id)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1  # both calls share one pass
    rows = df.collect()
    assert rows and all(r["rn"] >= 1 for r in rows)


# --- round-6 function batch (non-oracled names) -----------------------------


def test_fn_batch_scalar_semantics(spark):
    eng = _eng(spark)
    row = eng.sql(
        "select xxHash64('abc') as xx, CRC32('abc') as crc,"
        " floor(sin(0) * 1000) as s0, floor(cos(0) * 1000) as c0,"
        " floor(pi() * 10000) as pi4,"
        " assumeNotNull(nullIf(1, 2)) as ann,"
        " isNull(nullIf(1, 1)) as isn,"
        " isNotNull(nullIf(1, 1)) as isnn,"
        " empty('') as e1, empty('x') as e2,"
        " replaceRegexpAll('a1b2', '[0-9]', '_') as rep,"
        " arrayStringConcat(splitByString('--', 'a--b--c'), '|') as sp,"
        " arrayStringConcat(arraySlice(['a','b','c','d'], 2), ',') as tl"
    ).collect()[0]
    assert row["crc"] == 891568578  # published CRC32('abc')
    assert isinstance(row["xx"], int)
    assert row["s0"] == 0 and row["c0"] == 1000 and row["pi4"] == 31415
    assert row["ann"] == 1 and row["isn"] is True and row["isnn"] is False
    assert row["e1"] is True and row["e2"] is False
    assert row["rep"] == "a_b_"
    assert row["sp"] == "a|b|c"
    assert row["tl"] == "b,c,d"  # arraySlice default length = to the end


def test_fn_multiif_arity_error(spark):
    eng = _eng(spark)
    with pytest.raises(Exception, match="multiIf"):
        eng.sql("select multiIf(1 = 1, 'a') as x").collect()


def test_fn_anylast_and_zip(spark):
    eng = _eng(spark)
    rows = eng.sql(
        "select anyLast(v) as last_v from "
        "(select case when doc_id % 2 = 0 then doc_id else null end as v "
        " from documents where doc_id < 10) t"
    ).collect()
    assert rows[0]["last_v"] is not None  # some non-null survived
    z = eng.sql(
        "select arrayLength(arrayZip([1, 2], ['a', 'b'])) as n"
    ).collect()[0]["n"]
    assert z == 2


def test_fn_arrayenumerate_empty_guard(spark):
    # empty array must yield [], not Spark's DOWNWARD sequence(1, 0)
    eng = _eng(spark)
    row = eng.sql(
        "select arrayLength(arrayEnumerate(arrayFilter(x -> x > 9, [1])))"
        " as n0,"
        " arrayEnumerate(['a','b','c'])[3] as last_idx"
    ).collect()[0]
    assert row["n0"] == 0 and row["last_idx"] == 3


# --- WITH FILL ---------------------------------------------------------------


def test_with_fill_parse_shapes():
    q = parse("select a from t order by a with fill from 1 to 9 step 2").query
    f_from, f_to, f_step = q.order_by[0].fill
    assert f_from.value == 1 and f_to.value == 9 and f_step.value == 2
    q2 = parse("select a from t order by a with fill").query
    assert q2.order_by[0].fill == (None, None, None)


def test_with_fill_bounds_and_gaps(spark):
    rows = _eng(spark).sql(
        "select intDiv(event_id, 10) as b, count(*) as n "
        "from events where event_type = 'purchase' and event_id < 300 "
        "group by intDiv(event_id, 10) order by b with fill from 0 to 30"
    ).collect()
    assert [r["b"] for r in rows] == list(range(30))  # TO exclusive
    assert any(r["n"] is None for r in rows)  # gaps became NULL rows


def test_with_fill_minmax_bounds_and_step(spark):
    rows = _eng(spark).sql(
        "select intDiv(event_id, 25) as b, count(*) as n "
        "from events where event_type = 'signup' and event_id < 200 "
        "group by intDiv(event_id, 25) order by b with fill step 2"
    ).collect()
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)
    # odd originals survive the even-step series (FULL OUTER semantics)
    assert 1 in bs and 0 in bs


def test_with_fill_errors(spark):
    from nutdb_spark.frontend.lower import LoweringError

    eng = _eng(spark)
    with pytest.raises(LoweringError, match="ascending"):
        eng.sql(
            "select event_id as e from events order by e desc with fill"
        )
    with pytest.raises(LoweringError, match="output column"):
        eng.sql(
            "select event_id as e from events "
            "order by event_id + 1 with fill"
        )
    with pytest.raises(LoweringError, match="STEP"):
        eng.sql("select ts from events order by ts with fill")


def test_with_fill_temporal_step(spark):
    rows = _eng(spark).sql(
        "select toStartOfDay(ts) as d, count(*) as n from events "
        "where event_type = 'purchase' group by toStartOfDay(ts) "
        "order by d with fill step interval 1 day"
    ).collect()
    ds = [r["d"] for r in rows]
    assert len(ds) >= 2 and ds == sorted(ds)
    # consecutive days, no calendar gaps
    deltas = {(b - a).days for a, b in zip(ds, ds[1:])}
    assert deltas == {1}


# --- chained CTEs + WITH RECURSIVE ------------------------------------------


def test_chained_cte_and_subquery_scope(spark):
    eng = _eng(spark)
    assert eng.sql(
        "with a as (select 1 as x), b as (select x + 1 as y from a) "
        "select y from b"
    ).collect()[0]["y"] == 2
    # a subquery sees the enclosing WITH
    assert eng.sql(
        "with a as (select 3 as x) "
        "select (select x from a) as v"
    ).collect()[0]["v"] == 3


def test_recursive_union_all_sequence(spark):
    rows = _eng(spark).sql(
        "with recursive seq as (select 1 as n union all "
        "select n + 1 as n from seq where n < 6) "
        "select n from seq order by n"
    ).collect()
    assert [r["n"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_recursive_distinct_terminates_on_cycle(spark):
    # self-loop: k -> k forever under ALL; DISTINCT subtracts the
    # accumulator so the fixpoint closes after one round
    rows = _eng(spark).sql(
        "with recursive c as (select 5 as k union distinct "
        "select k as k from c) select k from c"
    ).collect()
    assert [r["k"] for r in rows] == [5]


def test_recursive_iteration_cap(spark):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="exceeded"):
        _eng(spark).sql(
            "with recursive c as (select 1 as n union all "
            "select n + 1 as n from c) select n from c"
        )


def test_recursive_requires_union_shape(spark):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="UNION"):
        _eng(spark).sql(
            "with recursive c as (select n + 1 as n from c) "
            "select n from c"
        )


def test_nonrecursive_cte_under_recursive_keyword(spark):
    # standard SQL: RECURSIVE marks the WITH; a body that never
    # references itself lowers as an ordinary CTE
    assert _eng(spark).sql(
        "with recursive a as (select 7 as x) select x from a"
    ).collect()[0]["x"] == 7


def test_recursive_arity_mismatch(spark):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="arity"):
        _eng(spark).sql(
            "with recursive c as (select 1 as n union all "
            "select n + 1 as n, 2 as m from c where n < 3) "
            "select n from c"
        )
