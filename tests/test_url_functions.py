"""Pins for the URL function family (functions/registry.py URL
section): edge shapes the suite entry's four fixture-derived URL
forms don't isolate — schemeless hosts, missing parts, userinfo,
public-suffix branching, percent-coding round-trips.
"""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def _one(eng, expr: str):
    return eng.sql(f"select {expr} as v from numbers(1)").collect()[0][0]


URL = "https://www.news.yandex.com.tr:8080/a/b?x=1&y=2%20z#frag"


@pytest.mark.parametrize(
    "expr,expected",
    [
        (f"protocol('{URL}')", "https"),
        (f"domain('{URL}')", "www.news.yandex.com.tr"),
        (f"domainWithoutWWW('{URL}')", "news.yandex.com.tr"),
        (f"netloc('{URL}')", "www.news.yandex.com.tr:8080"),
        (f"port('{URL}')", 8080),
        (f"path('{URL}')", "/a/b"),
        (f"pathFull('{URL}')", "/a/b?x=1&y=2%20z#frag"),
        (f"queryString('{URL}')", "x=1&y=2%20z"),
        (f"fragment('{URL}')", "frag"),
        (f"queryStringAndFragment('{URL}')", "x=1&y=2%20z#frag"),
        (f"topLevelDomain('{URL}')", "tr"),
        (f"firstSignificantSubdomain('{URL}')", "yandex"),
        (f"cutToFirstSignificantSubdomain('{URL}')", "yandex.com.tr"),
        (f"cutWWW('{URL}')",
         "https://news.yandex.com.tr:8080/a/b?x=1&y=2%20z#frag"),
        (f"cutQueryString('{URL}')",
         "https://www.news.yandex.com.tr:8080/a/b#frag"),
        (f"cutFragment('{URL}')",
         "https://www.news.yandex.com.tr:8080/a/b?x=1&y=2%20z"),
        (f"cutQueryStringAndFragment('{URL}')",
         "https://www.news.yandex.com.tr:8080/a/b"),
        (f"extractURLParameter('{URL}', 'y')", "2%20z"),
        (f"extractURLParameter('{URL}', 'nope')", ""),
        # userinfo is part of netloc but never of domain
        ("domain('http://user:pw@ex.org/p')", "ex.org"),
        ("netloc('http://user:pw@ex.org/p')", "user:pw@ex.org"),
        # scheme-relative
        ("domain('//cdn.site.io/x')", "cdn.site.io"),
        ("protocol('//cdn.site.io/x')", ""),
        # no authority at all: domain-ish fns empty, path is the text
        ("domain('plain/path?q=1')", ""),
        ("path('plain/path?q=1')", "plain/path"),
        ("port('plain/path')", 0),
        # port default argument
        ("port('https://h.io/x', 443)", 443),
        # public-suffix branch: second-to-last label NOT a registry
        ("firstSignificantSubdomain('https://a.b.site.io/')", "site"),
        ("cutToFirstSignificantSubdomain('https://a.b.site.io/')",
         "site.io"),
        ("topLevelDomain('http://localhost/x')", ""),
        ("firstSignificantSubdomain('http://localhost/x')", ""),
        # percent-coding (form-encoded: space <-> '+')
        ("decodeURLComponent('a%20b%2Fc')", "a b/c"),
        ("encodeURLComponent('a b/c')", "a+b%2Fc"),
        ("decodeURLComponent(encodeURLComponent('x y&z=1/2'))",
         "x y&z=1/2"),
    ],
)
def test_url_functions(eng, expr, expected):
    assert _one(eng, expr) == expected


def test_extract_url_parameter_names_and_pairs(eng):
    assert _one(
        eng, f"arrayStringConcat(extractURLParameterNames('{URL}'), ',')"
    ) == "x,y"
    assert _one(
        eng, f"arrayStringConcat(extractURLParameters('{URL}'), '&')"
    ) == "x=1&y=2%20z"


# --- window extras (same session fixtures) --------------------------------


def test_nth_value_null_prefix(eng):
    rows = eng.sql(
        "select user_id, event_id, nth_value(event_id, 3) over "
        "(partition by user_id order by ts) as nv "
        "from events where user_id = 1 order by ts limit 4"
    ).collect()
    assert rows[0]["nv"] is None and rows[1]["nv"] is None
    assert rows[2]["nv"] == rows[3]["nv"] == rows[2]["event_id"]


def test_lag_in_frame_alias(eng):
    rows = eng.sql(
        "select lagInFrame(event_id) over (partition by user_id "
        "order by ts) as a, lag(event_id) over (partition by user_id "
        "order by ts) as b from events where user_id = 1"
    ).collect()
    assert all(r["a"] == r["b"] for r in rows)


def test_window_extras_require_order(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="requires ORDER BY"):
        eng.sql(
            "select nth_value(event_id, 2) over "
            "(partition by user_id) from events"
        )


# --- tier-5 scalars: libm members (not oracle-safe, pinned here) ----------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("hypot(3.0, 4.0)", 5.0),
        ("asinh(0.0)", 0.0),
        ("acosh(1.0)", 0.0),
        ("atanh(0.0)", 0.0),
        ("cot(pi() / 4)", 1.0000000000000002),
        ("bitmaskToList(50)", "2,16,32"),
        ("bitmaskToList(0)", ""),
        ("toModifiedJulianDay(makeDate(1858, 11, 17))", 0),
        ("monthName(makeDate(2024, 2, 29))", "February"),
        ("dotProduct([1, 2], [3, 4])", 11.0),
        ("cosineDistance([1, 0], [1, 0])", 0.0),
        ("cosineDistance([1, 0], [0, 1])", 1.0),
        ("LinfNorm([-7, 3])", 7.0),
    ],
)
def test_tier5_scalars(eng, expr, expected):
    got = _one(eng, expr)
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


def test_map_update_collision(eng):
    assert _one(
        eng,
        "arrayStringConcat(arrayMap(x -> toString(x), mapValues("
        "mapUpdate(mapFromArrays(['a','b'], [1, 2]), "
        "mapFromArrays(['b','c'], [9, 3])))), ',')",
    ) == "1,9,3"


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("arrayFold((acc, x) -> acc * 10 + x, [1, 2, 3], 0)", 123),
        ("arrayReduce('sum', [1, 2, 3])", 6),
        ("arrayReduce('max', [1, 7, 3])", 7),
        ("arrayReduce('count', [1, 7, 3])", 3),
        ("arrayReduce('uniq', [1, 1, 3])", 2),
        ("arrayReduce('any', [9, 1])", 9),
        ("arrayReduce('anyLast', [9, 1])", 1),
    ],
)
def test_array_fold_reduce(eng, expr, expected):
    assert _one(eng, expr) == expected


def test_array_reduce_unknown_agg(eng):
    with pytest.raises(Exception, match="unsupported aggregate"):
        eng.sql("select arrayReduce('median', [1,2]) from numbers(1)")


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("arrayRotateLeft([1,2,3,4], 1)", [2, 3, 4, 1]),
        ("arrayRotateLeft([1,2,3,4], 6)", [3, 4, 1, 2]),
        ("arrayRotateLeft([1,2,3,4], 0)", [1, 2, 3, 4]),
        ("arrayRotateRight([1,2,3,4], 1)", [4, 1, 2, 3]),
        ("arrayShiftLeft([1,2,3,4], 2, 0)", [3, 4, 0, 0]),
        ("arrayShiftLeft([1,2,3], 2)", [3, None, None]),
        ("arrayShiftRight([1,2,3,4], 1, 0)", [0, 1, 2, 3]),
        ("hasSubstr([1,2,3,4], [2,3])", True),
        ("hasSubstr([1,2,3,4], [2,4])", False),
        ("hasSubstr([1,2], [])", True),
        ("hasSubstr([1], [1,2])", False),
        ("multiSearchFirstIndex('click', ['zz', 'ick'])", 2),
        ("multiSearchFirstIndex('click', ['zz'])", 0),
        ("multiSearchFirstPosition('click', ['ck', 'li'])", 2),
        ("multiSearchFirstPosition('click', ['zz'])", 0),
        ("toUnixTimestamp64Nano(toDatetime('1970-01-01 00:00:01'))",
         1000000000),
        ("JSONExtractBool('{\"t\":true}', 't')", True),
    ],
)
def test_tier6_scalars(eng, expr, expected):
    assert _one(eng, expr) == expected


def test_raw_arg_fns_demand_string_literals(eng):
    from nutdb_spark.frontend.lower import LoweringError

    for sql in (
        "select extractURLParameter('u', event_type) from events",
        "select countMatches(event_type, event_type) from events",
        "select arrayReduce(event_type, [1]) from events",
    ):
        with pytest.raises(LoweringError, match="string literal"):
            eng.sql(sql)


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("toInt64OrNull('12')", 12),
        ("toInt64OrNull('12x')", None),
        ("toInt32OrZero('nope')", 0),
        # unsigned types widen (catalog map: UInt16 -> int), so the
        # value is representable rather than CH's overflow-to-zero
        ("toUInt16OrZero('70000')", 70000),
        ("toUInt16OrZero('x')", 0),
        ("toFloat64OrZero('2.5')", 2.5),
        ("toDateOrNull('2024-02-30')", None),
        ("toString(toDateOrNull('2024-02-29'))", "2024-02-29"),
        ("toString(subtractWeeks(toDate('2024-01-15'), 2))",
         "2024-01-01"),
        ("toString(subtractSeconds("
         "toDatetime('2024-01-01 00:00:10'), 9))",
         "2024-01-01 00:00:01"),
        ("toString(subtractMinutes("
         "toDatetime('2024-01-01 00:10:00'), 9))",
         "2024-01-01 00:01:00"),
    ],
)
def test_lenient_casts_and_subtract_helpers(eng, expr, expected):
    assert _one(eng, expr) == expected


def test_explain_ast_renders_tree(eng):
    rows = [
        r["ast"]
        for r in eng.sql(
            "explain ast select event_id from events where user_id = 1"
        ).collect()
    ]
    assert rows[0] == "SelectCore"
    assert any("TableRef" in l for l in rows)
    assert any("BinOp" in l for l in rows)


def test_explain_estimate(eng):
    r = eng.sql(
        "explain estimate select * from lineitem where l_quantity > 30"
    ).first()
    assert r["size_bytes"] > 0
    assert dict(
        eng.sql("explain estimate select 1 from numbers(5)").first()
        .asDict()
    )["size_bytes"] >= 0


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("arrayLast(x -> x % 2 = 0, [1, 2, 3, 4, 5])", 4),
        ("arrayLast(x -> x > 9, [1, 2])", None),
        ("arrayFirstIndex(x -> x % 2 = 0, [1, 2, 3, 4])", 2),
        ("arrayFirstIndex(x -> x > 9, [1, 2])", 0),
        ("arrayLastIndex(x -> x % 2 = 0, [1, 2, 3, 4])", 4),
        ("arrayLastIndex(x -> x > 9, [1, 2])", 0),
        ("countEqual([1, 2, 2, 3], 2)", 2),
        ("countEqual([1, 2], 9)", 0),
    ],
)
def test_array_accessor_family(eng, expr, expected):
    assert _one(eng, expr) == expected
