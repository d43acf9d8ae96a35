"""Tier-7 function surface — the names PYTEST_ONLY keeps off the hash
oracle (libm haversine, sketch quantiles, unicode bars, 64-bit rotates,
map arithmetic) plus edge cases of the oracled ones. The oracle-safe
tier-7 subset is value-graded by sql_fn_tier7 / sql_median_exact.
"""

from __future__ import annotations

import math

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def _one(eng, expr):
    return eng.sql(f"select {expr} as v").first()["v"]


def test_bit_rotates(eng):
    r = eng.sql(
        "select bitRotateLeft(3, 62) as a, bitRotateRight(3, 1) as b, "
        "bitRotateLeft(1, 0) as c, bitRotateLeft(1, 64) as d, "
        "bitRotateRight(bitRotateLeft(123456789, 17), 17) as e"
    ).first()
    # 0b11 rotated left 62: bits land at 62 and 63
    assert r["a"] == -4611686018427387904
    # 0b11 rotated right 1: bits at 63 and 0
    assert r["b"] == -9223372036854775807
    assert r["c"] == 1 and r["d"] == 1  # 0 and full-width are no-ops
    assert r["e"] == 123456789          # rotate round-trips


def test_map_add_subtract(eng):
    r = eng.sql(
        "select mapAdd({'a': 1, 'b': 2}, {'b': 10, 'c': 3}) as m, "
        "mapSubtract({'a': 5}, {'a': 2, 'z': 7}) as s"
    ).first()
    assert dict(r["m"]) == {"a": 1, "b": 12, "c": 3}
    assert dict(r["s"]) == {"a": 3, "z": -7}


def test_great_circle_distance(eng):
    # one degree of latitude on CH's sphere radius ≈ 111.226 km;
    # libm path — tolerance, not exactness (see PYTEST_ONLY)
    v = _one(eng, "greatCircleDistance(0.0, 0.0, 0.0, 1.0)")
    assert math.isclose(v, 111226.0, rel_tol=1e-4)
    assert _one(eng, "geoDistance(30.0, 10.0, 30.0, 10.0)") == 0.0


def test_bar(eng):
    r = eng.sql(
        "select bar(3, 0, 10, 4) as a, bar(0, 0, 10, 4) as b, "
        "bar(10, 0, 10, 4) as c, bar(15, 0, 10, 4) as d"
    ).first()
    assert r["a"] == "█▏"        # 9.6 eighths → 1 full + 1 eighth
    assert r["b"] == ""
    assert r["c"] == "████" == r["d"]  # clamped at width


def test_quantile_sketches(eng):
    # sketch estimates: exact on tiny inputs, never hash-oracled
    r = eng.sql(
        "select quantileTDigest(0.5)(n) as a, quantileTiming(0.5)(n) as b "
        "from (select number as n from numbers(101))"
    ).first()
    assert r["a"] == 50 and r["b"] == 50


def test_array_resize_null_pad(eng):
    r = eng.sql(
        "select arrayResize([1, 2], 4) as a, arrayResize([1, 2, 3], 2) as b"
    ).first()
    assert list(r["a"]) == [1, 2, None, None]  # documented NULL pad
    assert list(r["b"]) == [1, 2]


def test_ngram_search_and_short_strings(eng):
    r = eng.sql(
        "select ngramSearch('hello world', 'world') as full_hit, "
        "ngramSearch('hello', 'xyz') as short_needle, "
        "ngramDistance('abc', 'abc') as short_eq, "
        "ngramDistance('abc', 'abd') as short_ne"
    ).first()
    assert r["full_hit"] == 1.0
    assert r["short_needle"] == 1.0  # <4-char needle: no grams to miss
    assert r["short_eq"] == 0.0 and r["short_ne"] == 1.0


def test_median_exact_bounded_plan(eng, spark):
    """medianExact must lower through the bounded pre-aggregate (the
    __tkv plan marker), not a collect_list buffer."""
    df = eng.sql(
        "select l_returnflag as f, medianExact(l_quantity) as m "
        "from lineitem group by f"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__tkv" in plan
    assert "collect_list" not in plan
    rows = {r["f"]: r["m"] for r in df.collect()}
    assert set(rows) == {"A", "N", "R"}
    # even-count lower-median convention
    r = eng.sql(
        "select medianExact(n) as v from "
        "(select number as n from numbers(4))"
    ).first()
    assert r["v"] == 1  # lower median of 0,1,2,3


def test_ngram_case_insensitive(eng):
    r = eng.sql(
        "select ngramDistance('HELLO WORLD', 'hello world') as a, "
        "ngramDistanceCaseInsensitive('HELLO WORLD', 'hello world') as b, "
        "ngramSearchCaseInsensitive('Hello World', 'WORLD') as c"
    ).first()
    assert r["a"] == 1.0  # case-sensitive: no common grams
    assert r["b"] == 0.0
    assert r["c"] == 1.0
