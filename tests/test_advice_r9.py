"""Pins for the round-9 advice fixes: the chi²-family encoding-domain
guard, locale-independent dayName, and WITH TIES after every LIMIT
form (reference grammar parser/mod.rs:513-543). arrayFill CH-carry and
timeSlots negative-duration pins live in tests/test_fn_tier8.py.
"""

from __future__ import annotations

import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.parser import parse
from nutdb_spark.frontend.printer import query as print_q


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_assoc_domain_guard_nulls_out_of_range(eng):
    # y >= 1e6 / negative codes are not injectively encodable: the
    # whole group's association stats must be NULL, not plausible junk
    r = eng.sql(
        "select cramersV(x, y) as cv, cramersVBiasCorrected(x, y) as cvbc, "
        "contingency(x, y) as cont, theilsU(x, y) as tu "
        "from (select arrayJoin([1, 2, 3]) as x, 2000000 as y)"
    ).first()
    assert r["cv"] is None
    assert r["cvbc"] is None
    assert r["cont"] is None
    assert r["tu"] is None
    r = eng.sql(
        "select cramersV(x, y) as cv from "
        "(select arrayJoin([-1, 2, 3]) as x, 1 as y)"
    ).first()
    assert r["cv"] is None
    # in-domain groups still produce values
    r = eng.sql(
        "select cramersV(x, y) as cv from "
        "(select arrayJoin([1, 1, 2, 2]) as x, arrayJoin([1, 2]) as y)"
    ).first()
    assert r["cv"] is not None


def test_dayname_fixed_english_names(eng):
    r = eng.sql(
        "select dayName(toDate('2024-03-17')) as a, "
        "dayName(toDate('2024-03-18')) as b, "
        "dayName(toDate('2024-03-23')) as c"
    ).first()
    assert (r["a"], r["b"], r["c"]) == ("Sunday", "Monday", "Saturday")


_TIES_SRC = "(select arrayJoin([1, 2, 2, 3, 3, 3, 4]) as x)"


def test_limit_offset_with_ties_semantics(eng):
    # ANSI shape: OFFSET skips first, ties of the last fetched row kept
    got = [
        r["x"]
        for r in eng.sql(
            f"select x from {_TIES_SRC} order by x limit 2 offset 1 with ties"
        ).collect()
    ]
    assert got == [2, 2]
    got = [
        r["x"]
        for r in eng.sql(
            f"select x from {_TIES_SRC} order by x limit 2 offset 2 with ties"
        ).collect()
    ]
    assert got == [2, 3, 3, 3]
    # MySQL comma form takes WITH TIES too (mod.rs:516-521)
    got = [
        r["x"]
        for r in eng.sql(
            f"select x from {_TIES_SRC} order by x limit 1, 2 with ties"
        ).collect()
    ]
    assert got == [2, 2]


def test_limit_offset_with_ties_prints_native(eng):
    sql = f"select x from {_TIES_SRC} order by x limit 2 offset 1 with ties"
    printed = print_q(parse(sql).query)
    assert "LIMIT 2 OFFSET 1 WITH TIES" in printed
    assert "FETCH" not in printed
    a = [r["x"] for r in eng.sql(sql).collect()]
    b = [r["x"] for r in eng.sql(printed).collect()]
    assert a == b


def test_assoc_domain_guard_nulls_oversized_x(eng):
    # x past 2^53/K breaks the double-exact x*K+y encoding (and
    # ~9.2e12 overflows the long encoding outright) — the whole
    # group must be NULL, not plausible junk (r10 ADVICE).
    row = eng.sql(
        "select cramersV(x, y) as cv, theilsU(x, y) as tu from "
        "(select 9100000000 as x, 1 as y "
        " union all select 9100000001, 2 "
        " union all select 1, 1)"
    ).first()
    assert row["cv"] is None and row["tu"] is None
    # the boundary value itself is still in-domain
    ok = eng.sql(
        "select cramersV(x, y) as cv from "
        "(select 9007199254 as x, 1 as y union all select 1, 2)"
    ).first()
    assert ok["cv"] is not None
