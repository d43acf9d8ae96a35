"""[EXT] ClickHouse ANY join strictness. Parse-shape asserts first
(keyword traps bite silently), then semantics: pick-one determinism,
preserved-side cardinality, USING-required error."""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.frontend.parser import parse


def _kinds(src):
    return [j.kind for j in parse(src).query.joins]


def test_parse_any_join_kinds():
    assert _kinds("SELECT 1 FROM a LEFT ANY JOIN b USING (k)") == ["left_any"]
    assert _kinds("SELECT 1 FROM a INNER ANY JOIN b USING (k)") == [
        "inner_any"
    ]
    assert _kinds("SELECT 1 FROM a RIGHT ANY JOIN b USING (k)") == [
        "right_any"
    ]
    # plain joins unchanged
    assert _kinds("SELECT 1 FROM a LEFT JOIN b USING (k)") == ["left"]
    # a table named/aliased around `any` is unaffected (no leading-ANY
    # form, so `any` is only read inside an explicit join prefix)
    assert _kinds("SELECT 1 FROM a LEFT SEMI JOIN b USING (k)") == [
        "left_semi"
    ]


@pytest.fixture()
def eng(spark, sf_dir):
    from nutdb_spark.engine import NutEngine

    e = NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())
    dup = spark.createDataFrame(
        [(1, "b", 10), (1, "a", 20), (2, "c", 30)], "k int, v string, w int"
    )
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k int")
    real = e.resolve_table
    e.resolve_table = lambda n: (
        dup if n == "d" else left if n == "l" else real(n)
    )
    return e


def test_left_any_preserves_left_cardinality(eng):
    rows = [
        tuple(r)
        for r in eng.sql(
            "select k, v from l left any join d using (k) order by k"
        ).collect()
    ]
    # 4 left rows in, 4 out — no fanout on the duplicate k=1, miss → NULL
    assert rows == [(1, "a"), (1, "a"), (2, "c"), (3, None)]


def test_inner_any_drops_misses(eng):
    rows = [
        tuple(r)
        for r in eng.sql(
            "select k, v from l inner any join d using (k) order by k"
        ).collect()
    ]
    assert rows == [(1, "a"), (1, "a"), (2, "c")]


def test_right_any_mirrors(eng):
    rows = [
        tuple(r)
        for r in eng.sql(
            "select k, v from d right any join l using (k) order by k, v"
        ).collect()
    ]
    # all 4 right (l) rows preserved; d deduped per key
    assert rows == [(1, "a"), (1, "a"), (2, "c"), (3, None)]


def test_any_pick_is_deterministic_first_by_remaining_columns(eng):
    # d has k=1 → ("a",20) and ("b",10); order over (v, w) picks "a"
    rows = eng.sql(
        "select k, v, w from l inner any join d using (k) "
        "where k = 1"
    ).collect()
    assert {(r["v"], r["w"]) for r in rows} == {("a", 20)}


def test_any_join_on_form_matches_using(eng):
    # the ON equi-key form (added later) must agree with USING when
    # the key names align
    on = eng.sql(
        "select l.k as k, d.v as v from l left any join d on l.k = d.k "
        "order by k"
    ).collect()
    using = eng.sql(
        "select k, v from l left any join d using (k) order by k"
    ).collect()
    assert [tuple(r) for r in on] == [tuple(r) for r in using]


# --- ASOF JOIN USING (k..., ts) --------------------------------------------


def test_asof_using_matches_on_form(spark, sf_dir):
    import tempfile

    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())
    on_form = eng.sql(
        """
        select e.event_id, m.m_val from
          (select event_id, user_id, ts from events where event_id < 500) as e
        asof join (select user_id as u, ts as t, max(value) as m_val
                   from events where event_type = 'purchase'
                   group by 1, 2) as m
        on e.user_id = m.u and e.ts >= m.t
        order by e.event_id
        """
    ).collect()
    using_form = eng.sql(
        """
        select e.event_id, m_val from
          (select event_id, user_id, ts from events where event_id < 500) as e
        asof join (select user_id, ts, max(value) as m_val
                   from events where event_type = 'purchase'
                   group by user_id, ts) as m
        using (user_id, ts)
        order by event_id
        """
    ).collect()
    assert [tuple(r) for r in on_form] == [tuple(r) for r in using_form]


def test_asof_using_needs_two_columns(spark, sf_dir):
    import tempfile

    from nutdb_spark.engine import NutEngine
    from nutdb_spark.frontend.lower import LoweringError

    eng = NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())
    with pytest.raises(LoweringError, match="at least two"):
        eng.sql(
            "select 1 from events e asof join events m using (ts)"
        ).collect()


def test_any_pick_partition_independent(spark, sf_dir):
    # the deterministic pick must not depend on input partitioning or
    # arrival order — shuffle the right side three ways, same answer
    import tempfile

    from nutdb_spark.engine import NutEngine

    base = spark.createDataFrame(
        [(k, f"v{k}_{i}", i * 7 % 13) for k in range(20) for i in range(5)],
        "k int, v string, w int",
    )
    left = spark.createDataFrame([(k,) for k in range(25)], "k int")
    outs = []
    for right in (
        base,
        base.repartition(17, "w"),
        base.orderBy("w").coalesce(1),
    ):
        eng = NutEngine(
            spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp()
        )
        real = eng.resolve_table
        eng.resolve_table = (
            lambda r, rt: (
                lambda n: rt if n == "d" else left if n == "l" else r(n)
            )
        )(real, right)
        outs.append(
            sorted(
                tuple(r)
                for r in eng.sql(
                    "select k, v, w from l left any join d using (k)"
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_any_join_on_form_no_fanout(eng):
    n_left = eng.sql("select count() as n from orders").first()["n"]
    n_join = eng.sql(
        "select count() as n from (select o.o_orderkey from orders o "
        "left any join lineitem l on o.o_orderkey = l.l_orderkey)"
    ).first()["n"]
    assert n_left == n_join


def test_any_join_on_rejects_non_equi(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="equi-key"):
        eng.sql(
            "select 1 from orders o left any join lineitem l "
            "on o.o_orderkey < l.l_orderkey"
        )
