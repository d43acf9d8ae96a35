"""Pins for INTERVAL-offset RANGE frames: rejection shapes (ROWS
frames, variable-length units), printer round-trip, and equivalence
with the manual epoch-micros spelling.
"""

from __future__ import annotations

import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.lower import LoweringError
from nutdb_spark.frontend.parser import parse
from nutdb_spark.frontend.printer import query as print_q


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_interval_bounds_match_manual_micros(eng):
    a = eng.sql(
        "select user_id, event_id, count(*) over ("
        "  partition by user_id order by ts"
        "  range between interval 1 hour preceding and current row) as n "
        "from events where user_id < 5 order by user_id, event_id"
    ).collect()
    b = eng.sql(
        "select user_id, event_id, count(*) over ("
        "  partition by user_id order by ets"
        "  range between 3600000000 preceding and current row) as n "
        "from (select user_id, event_id, toUnixMicros(ts) as ets"
        "      from events) where user_id < 5 order by user_id, event_id"
    ).collect()
    assert a == b


def test_interval_bounds_reject_rows_and_months(eng):
    with pytest.raises(LoweringError, match="RANGE frame"):
        eng.sql(
            "select count(*) over (order by ts rows between "
            "interval 1 hour preceding and current row) as n "
            "from events limit 1"
        )
    with pytest.raises(LoweringError, match="fixed-length"):
        eng.sql(
            "select count(*) over (partition by user_id order by ts "
            "range between interval 1 month preceding and current row) "
            "as n from events limit 1"
        )


def test_interval_bound_prints_and_roundtrips(eng):
    sql = (
        "select user_id, count(*) over (partition by user_id order by ts "
        "range between interval 2 minute preceding and current row) as n "
        "from events where user_id < 3 order by user_id, n"
    )
    printed = print_q(parse(sql).query)
    assert "INTERVAL 2 MINUTE PRECEDING" in printed
    assert eng.sql(sql).collect() == eng.sql(printed).collect()
