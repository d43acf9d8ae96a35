"""Tier-8 surface pins: parseDateTime family, interval constructors,
new INTERVAL units (WEEK/QUARTER) through arithmetic and
toStartOfInterval, timeSlots edges, arrayFill leading-failure
semantics. The oracle-safe subset is value-graded by sql_fn_tier8.
"""

from __future__ import annotations

import datetime as dt

import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.lower import LoweringError

T = dt.datetime


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_parse_datetime_formats(eng):
    r = eng.sql(
        "select parseDateTime('17/03/2024 14:23:45', '%d/%m/%Y %T') as a, "
        "parseDateTime('2024-03-17', '%F') as b, "
        "parseDateTimeBestEffort('2024-03-17T14:23:45') as c, "
        "parseDateTimeBestEffort('20240317') as d, "
        "parseDateTimeBestEffort('17.03.2024 01:02:03') as e, "
        "parseDateTimeBestEffort('not a date') as f"
    ).first()
    assert r["a"] == T(2024, 3, 17, 14, 23, 45)
    assert r["b"] == T(2024, 3, 17)
    assert r["c"] == T(2024, 3, 17, 14, 23, 45)
    assert r["d"] == T(2024, 3, 17)
    assert r["e"] == T(2024, 3, 17, 1, 2, 3)
    assert r["f"] is None


def test_parse_datetime_requires_literal_pattern(eng):
    with pytest.raises(LoweringError, match="string literal"):
        eng.sql(
            "select parseDateTime('x', event_type) from events limit 1"
        )


def test_interval_constructors_and_new_units(eng):
    r = eng.sql(
        "select toDate('2024-01-31') + toIntervalMonth(1) as a, "
        "toDate('2024-01-01') + toIntervalWeek(2) as b, "
        "toDate('2024-01-01') + INTERVAL 1 QUARTER as c, "
        "toDate('2024-01-01') + INTERVAL 2 WEEK as d"
    ).first()
    assert r["a"] == dt.date(2024, 2, 29)  # month-end clamp
    assert r["b"] == dt.date(2024, 1, 15)
    assert r["c"] == dt.date(2024, 4, 1)
    assert r["d"] == dt.date(2024, 1, 15)


def test_to_start_of_interval_semantics(eng):
    r = eng.sql(
        "select toStartOfInterval(toDateTime('2024-03-17 14:23:45'), "
        "  INTERVAL 1 WEEK) as w, "
        "toStartOfInterval(toDateTime('2024-03-18 00:00:00'), "
        "  INTERVAL 1 WEEK) as w2, "
        "toStartOfInterval(toDateTime('2024-03-17 14:23:45'), "
        "  INTERVAL 1 QUARTER) as q, "
        "toStartOfInterval(toDateTime('2024-03-17 14:23:45'), "
        "  INTERVAL 90 SECOND) as s"
    ).first()
    # week buckets are Monday-anchored: n=1 ≡ toMonday
    assert r["w"] == T(2024, 3, 11)
    assert r["w2"] == T(2024, 3, 18)  # a Monday starts its own bucket
    assert r["q"] == dt.date(2024, 1, 1)
    # 90 s buckets anchor at the epoch (51825 s of day // 90 * 90)
    assert r["s"] == T(2024, 3, 17, 14, 22, 30)


def test_to_start_of_interval_requires_interval_literal(eng):
    with pytest.raises(LoweringError, match="INTERVAL literal"):
        eng.sql(
            "select toStartOfInterval(ts, 900) from events limit 1"
        )


def test_time_slots_edges(eng):
    rows = eng.sql(
        "select arrayStringConcat(arrayMap(x -> toString(x), "
        "timeSlots(toDateTime('2024-01-01 00:00:00'), 0)), '|') as a, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "timeSlots(toDateTime('2024-01-01 00:59:00'), 60, 3600)), '|') as b, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "timeSlots(toDateTime('2024-01-01 00:59:00'), -60)), '|') as c"
    ).first()
    assert rows["a"] == "2024-01-01 00:00:00"  # zero duration: one slot
    assert rows["b"] == "2024-01-01 00:00:00|2024-01-01 01:00:00"
    assert rows["c"] == ""  # negative duration: empty, never descending


def test_array_fill_carries_previous_result(eng):
    r = eng.sql(
        "select arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayFill(x -> x != 0, [0, 0, 5, 0])), ',') as a, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayReverseFill(x -> x != 0, [0, 7, 0, 0])), ',') as b, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayFill(x -> x > 2, [1, 2, 5])), ',') as c, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayReverseFill(x -> x > 2, [5, 2, 1])), ',') as d"
    ).first()
    assert r["a"] == "0,0,5,5"
    assert r["b"] == "7,7,0,0"
    # CH carries the previous RESULT: the first element's value
    # propagates through a leading failing run even when the run's
    # own values differ (the r9 advice divergence case)
    assert r["c"] == "1,1,5"
    assert r["d"] == "5,1,1"


def test_interval_printer_roundtrip(eng):
    from nutdb_spark.frontend.parser import parse
    from nutdb_spark.frontend.printer import query as print_q

    sql = (
        "select toStartOfInterval(toDateTime('2024-03-17 14:23:45'), "
        "INTERVAL 2 WEEK) as w"
    )
    printed = print_q(parse(sql).query)
    assert "INTERVAL 2 WEEK" in printed
    a = eng.sql(sql).first()["w"]
    b = eng.sql(printed).first()["w"]
    assert a == b


def test_array_functions_randomized_vs_python(spark, eng):
    """Batched randomized armor: 200 seeded random int arrays through
    arrayCumSumNonNegative / arrayEnumerateUniq / arrayEnumerateDense /
    arrayFill in ONE Spark job, compared against a pure-Python
    reference."""
    import random

    from pyspark.sql import functions as F

    from nutdb_spark.functions.registry import SCALAR_FNS

    rnd = random.Random(20260815)
    arrays = [
        [rnd.randint(-3, 3) for _ in range(rnd.randint(0, 8))]
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)],
        "i int, arr array<long>",
    )
    out = df.select(
        "i",
        SCALAR_FNS["arrayCumSumNonNegative"](F.col("arr")).alias("acs"),
        SCALAR_FNS["arrayEnumerateUniq"](F.col("arr")).alias("aeu"),
        SCALAR_FNS["arrayEnumerateDense"](F.col("arr")).alias("aed"),
        SCALAR_FNS["arrayFill"](
            lambda x: x != 0, F.col("arr")
        ).alias("af"),
    ).collect()

    def ref(a):
        acs, run = [], 0
        for x in a:
            run = max(run + x, 0)
            acs.append(run)
        aeu = [a[: i + 1].count(x) for i, x in enumerate(a)]
        aed = []
        for x in a:
            first = a.index(x)
            aed.append(len(set(a[: first + 1])))
        af, last = [], None
        for x in a:
            if x != 0:
                last = x
                af.append(x)
            else:
                # CH: carry the previous result; before any pass that
                # is the first element's value
                af.append(last if last is not None else a[0])
        return acs, aeu, aed, af

    for r in out:
        a = arrays[r["i"]]
        acs, aeu, aed, af = ref(a)
        assert list(r["acs"]) == acs, (a, list(r["acs"]), acs)
        assert list(r["aeu"]) == aeu, (a, list(r["aeu"]), aeu)
        assert list(r["aed"]) == aed, (a, list(r["aed"]), aed)
        assert list(r["af"]) == af, (a, list(r["af"]), af)
