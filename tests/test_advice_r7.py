"""Behavior pins for the round-6 ADVICE defects.

1. WITH FILL's exclusive TO bound must keep the last legitimate value
   when (TO - FROM) is not a multiple of STEP (hi = TO - STEP dropped
   it; now: generate through TO, filter key < TO).
2. intDiv must be exact past 2^53 (was double division + cast), and
   intDivOrZero must share its toward-zero rounding (was floor).
3. LIMIT n BY must honor ORDER BY NULLS FIRST/LAST when picking each
   key's head rows (the window dropped the nulls modifier).
4. SETTINGS is statement-scoped: prior conf values restored after the
   statement (test_mutations pins this); `__` escapes a literal
   underscore in a Spark conf key.
5. CTAS stages data in a tmp dir before saving metadata, so a failed
   CTAS leaves nothing registered; OR REPLACE CTAS drops the old table
   only after the new data is staged, so a self-referencing
   `CREATE OR REPLACE TABLE t AS SELECT ... FROM t` works.
"""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


# --- ADVICE 1: WITH FILL non-step-aligned exclusive TO ---------------------


def test_with_fill_to_not_step_aligned(eng):
    rows = eng.sql(
        "select intDiv(event_id, 100) as b, count(*) as n "
        "from events where event_id < 100 "
        "group by intDiv(event_id, 100) "
        "order by b with fill from 0 to 10 step 3"
    ).collect()
    # ClickHouse: 0,3,6,9 — 9 < 10 is a legitimate fill value
    assert [r["b"] for r in rows] == [0, 3, 6, 9]


def test_with_fill_to_step_aligned_still_exclusive(eng):
    rows = eng.sql(
        "select intDiv(event_id, 100) as b, count(*) as n "
        "from events where event_id < 100 "
        "group by intDiv(event_id, 100) "
        "order by b with fill from 0 to 9 step 3"
    ).collect()
    assert [r["b"] for r in rows] == [0, 3, 6]


# --- ADVICE 2: intDiv exactness / intDivOrZero consistency -----------------


def test_intdiv_exact_past_double_precision(eng):
    big = (1 << 60) + 1
    r = eng.sql(
        f"select intDiv({big}, 3) as q, intDiv(-7, 2) as neg"
    ).collect()[0]
    assert r["q"] == big // 3 == 384307168202282325  # exact; double loses it
    assert r["neg"] == -3  # toward zero, C/ClickHouse semantics


def test_intdivorzero_matches_intdiv_rounding(eng):
    r = eng.sql(
        "select intDivOrZero(-7, 2) as a, intDivOrZero(7, 0) as z, "
        f"intDivOrZero({(1 << 60) + 1}, 3) as big"
    ).collect()[0]
    assert r["a"] == -3  # was floor → -4
    assert r["z"] == 0
    assert r["big"] == 384307168202282325


# --- ADVICE 3: LIMIT n BY honors NULLS FIRST/LAST --------------------------


def test_limit_by_nulls_modifier(spark, eng):
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 2), ("b", None), ("b", 5)],
        "k string, v int",
    )
    real = eng.resolve_table
    eng.resolve_table = lambda name: df if name == "lbn" else real(name)
    head = eng.sql(
        "select k, v from lbn order by k, v desc nulls first limit 1 by k"
    ).collect()
    # per-key head under DESC NULLS FIRST is the NULL row, and the
    # presented order must agree with the picked rows
    assert [(r["k"], r["v"]) for r in head] == [("a", None), ("b", None)]
    tail = eng.sql(
        "select k, v from lbn order by k, v desc nulls last limit 1 by k"
    ).collect()
    assert [(r["k"], r["v"]) for r in tail] == [("a", 2), ("b", 5)]


# --- ADVICE 5: CTAS atomicity ----------------------------------------------


def test_failed_ctas_leaves_nothing_registered(eng):
    with pytest.raises(Exception):
        eng.sql("create table ctas_fail as select no_such_column from events")
    assert not eng.catalog.has_table("ctas_fail")
    # a retry with a valid query succeeds cleanly
    eng.sql("create table ctas_fail as select event_id from events limit 5")
    assert eng.sql("select count(*) as n from ctas_fail").collect()[0]["n"] == 5


def test_self_referencing_or_replace_ctas(eng):
    eng.sql("create table selfref as select event_id from events limit 10")
    eng.sql(
        "create or replace table selfref as "
        "select event_id from selfref where event_id % 2 = 0"
    )
    rows = eng.sql("select count(*) as n from selfref").collect()
    assert 0 < rows[0]["n"] <= 10
    # replacing with a failing query keeps the previous table intact
    n_before = rows[0]["n"]
    with pytest.raises(Exception):
        eng.sql(
            "create or replace table selfref as select nope from events"
        )
    assert (
        eng.sql("select count(*) as n from selfref").collect()[0]["n"]
        == n_before
    )
