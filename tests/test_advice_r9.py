"""Pins for the round-8 ADVICE items:

1. (high) Forward-direction ASOF join: a left row with a NULL
   timestamp must match NOTHING. The scan order was desc_nulls_last,
   which parked NULL-ts left rows AFTER every right row so they picked
   up the EARLIEST right payload — a spurious match (and a wrongly
   kept row under how='inner'). Fixed to desc_nulls_first.
2. (low) A Limit carrying both offset and with_ties (ANSI 'OFFSET n
   ROWS FETCH ... WITH TIES') must print in a re-parseable form — the
   printer now emits the ANSI FETCH spelling instead of the
   unparseable 'LIMIT n OFFSET m WITH TIES'.
3. (low) intExp2(n) guards n > 62 as well as n < 0: the JVM shiftleft
   masks the shift amount to 6 bits, so unguarded intExp2(64) silently
   returned 1 and intExp2(63) a negative long.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.parser import parse
from nutdb_spark.frontend.printer import query as print_q
from nutdb_spark.operators.asof import asof_join_any

T = dt.datetime


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


# --- 1. forward ASOF: NULL left ts matches nothing --------------------------


def _forward_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", T(2024, 1, 1, 10)),
            (2, "a", None),  # NULL ts: must match nothing
        ],
        "lid int, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", T(2024, 1, 1, 11), "a11"),
            ("a", T(2024, 1, 1, 12), "a12"),
        ],
        "k string, rts timestamp, v string",
    )
    return left, right


def test_forward_null_ts_left_row_matches_nothing(spark):
    left, right = _forward_fixture(spark)
    out = asof_join_any(
        left,
        right,
        left_keys=[F.col("k")],
        right_keys=[F.col("k")],
        left_ts=F.col("lts"),
        right_ts=F.col("rts"),
        direction="forward",
        prefix="r_",
    )
    rows = {r["lid"]: r["r_v"] for r in out.collect()}
    assert rows == {1: "a11", 2: None}


def test_forward_null_ts_left_row_dropped_under_inner(spark):
    left, right = _forward_fixture(spark)
    out = asof_join_any(
        left,
        right,
        left_keys=[F.col("k")],
        right_keys=[F.col("k")],
        left_ts=F.col("lts"),
        right_ts=F.col("rts"),
        direction="forward",
        how="inner",
        prefix="r_",
    )
    assert [r["lid"] for r in out.collect()] == [1]


def test_forward_null_ts_sql(eng):
    rows = eng.sql(
        "select l.lid as lid, r.v as v from "
        "(select 1 as lid, 1 as k, 10 as ts "
        " union all select 2, 1, null) as l "
        "left asof join "
        "(select 1 as k, 12 as ts, 'a' as v "
        " union all select 1, 19, 'b') as r "
        "on l.k = r.k and l.ts <= r.ts order by lid"
    ).collect()
    assert [(r["lid"], r["v"]) for r in rows] == [(1, "a"), (2, None)]


# --- 2. printer: offset + with_ties round-trips via the FETCH form ----------


def test_printer_offset_with_ties_roundtrips(eng):
    sql = (
        "SELECT l_orderkey, l_quantity FROM lineitem "
        "ORDER BY l_quantity DESC, l_orderkey "
        "OFFSET 2 ROWS FETCH FIRST 3 ROWS WITH TIES"
    )
    q = parse(sql)
    lim = q.query.limit
    assert lim.offset is not None and lim.with_ties
    printed = print_q(q.query)
    assert "FETCH FIRST" in printed and "WITH TIES" in printed
    q2 = parse(printed)  # must re-parse (was: 'unexpected trailing input')
    assert q2.query.limit.with_ties and q2.query.limit.offset is not None
    a = [tuple(r) for r in eng.sql(sql).collect()]
    b = [tuple(r) for r in eng.sql(printed).collect()]
    assert a == b and len(a) >= 3


# --- 3. intExp2 overflow guard ----------------------------------------------


def test_intexp2_overflow_guard(eng):
    rows = eng.sql(
        "select intExp2(62) as a, intExp2(63) as b, intExp2(64) as c, "
        "intExp2(0) as d, intExp2(-1) as e"
    ).first()
    assert rows["a"] == 2**62
    assert rows["b"] == 0  # would be negative under raw shiftleft
    assert rows["c"] == 0  # JVM masks shift to 6 bits → raw would be 1
    assert rows["d"] == 1
    assert rows["e"] == 0
