"""Tier-9 surface pins: shingle/ngram windows and their short-input
empties, hasSubsequence order sensitivity, arraySplit cut placement,
bit probes on negative inputs, and the map-family gaps (mapSort
determinism, mapApply tuple lambda, mapPopulateSeries typed zeros).
The oracle-safe subset is value-graded by sql_fn_tier9 / sql_fn_maps.
"""

from __future__ import annotations

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def _one(eng, sql):
    return eng.sql("select " + sql).first()


def test_shingles_and_ngrams_windows(eng):
    r = _one(
        eng,
        "arrayStringConcat(arrayMap(x -> arrayStringConcat("
        "  arrayMap(y -> toString(y), x), '-'), "
        "  arrayShingles([1,2,3,4], 3)), '|') as a, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  arrayShingles([1,2], 3)), '|') as b, "
        "arrayStringConcat(ngrams('abcde', 3), '|') as c, "
        "arrayStringConcat(ngrams('ab', 3), '|') as d",
    )
    assert r["a"] == "1-2-3|2-3-4"
    assert r["b"] == ""  # len < n: empty, never a downward sequence
    assert r["c"] == "abc|bcd|cde"
    assert r["d"] == ""


def test_has_subsequence_order_sensitive(eng):
    r = _one(
        eng,
        "hasSubsequence('garbage', 'grb') as a, "
        "hasSubsequence('garbage', 'gbr') as b, "
        "hasSubsequence('', '') as c, "
        "hasSubsequence('', 'x') as d, "
        "hasSubsequenceCaseInsensitive('GARBAGE', 'grb') as e",
    )
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (1, 0, 1, 0, 1)


def test_array_split_cut_placement(eng):
    r = _one(
        eng,
        "arrayStringConcat(arrayMap(x -> arrayStringConcat("
        "  arrayMap(y -> toString(y), x), '-'), "
        "  arraySplit(x -> x = 1, [1,0,0,1,0])), '|') as a, "
        "arrayStringConcat(arrayMap(x -> arrayStringConcat("
        "  arrayMap(y -> toString(y), x), '-'), "
        "  arrayReverseSplit(x -> x = 1, [1,0,0,1,0])), '|') as b, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  arraySplit(x -> x = 1, emptyArrayString())), '|') as c",
    )
    # split cuts BEFORE flagged elements (no leading empty group);
    # reverse-split cuts AFTER them (CH semantics)
    assert r["a"] == "1-0-0|1-0"
    assert r["b"] == "1|0-0-1|0"
    assert r["c"] == ""


def test_bit_positions_and_finite_guards(eng):
    r = _one(
        eng,
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  bitPositionsToArray(10)), ',') as a, "
        "arrayLast(x -> x >= 0, bitPositionsToArray(-1)) as b, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  bitPositionsToArray(0)), ',') as c, "
        "ifNotFinite(power(10.0, 400), 7.0) as d, "
        "ifNotFinite(2.5, 7.0) as e, "
        "nanToNull(sqrt(-1.0)) as f, nanToNull(4.0) as g",
    )
    assert r["a"] == "1,3"
    assert r["b"] == 63  # negative input: all 64 bits set, sign-safe
    assert r["c"] == ""
    assert r["d"] == 7.0
    assert r["e"] == 2.5
    assert r["f"] is None
    assert r["g"] == 4.0


def test_map_family(eng):
    r = _one(
        eng,
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapKeys(mapSort(map('b', 2, 'a', 1)))), ',') as a, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapKeys(mapReverseSort(map('b', 2, 'a', 1)))), ',') as b, "
        "mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) as c, "
        "mapAll((k, v) -> v > 1, map('a', 1, 'b', 2)) as d, "
        "mapContainsKeyLike(map('abc', 1, 'xyz', 2), 'a%') as e, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapKeys(mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'z%'))), "
        "  ',') as f, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapValues(mapPopulateSeries(map(1, 10, 4, 40)))), ',') as g, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapValues(mapApply((k, v) -> tuple(k, v * 2), "
        "    mapSort(map(1, 10, 2, 20))))), ',') as h",
    )
    assert r["a"] == "a,b"
    assert r["b"] == "b,a"
    assert (r["c"], r["d"], r["e"]) == (1, 0, 1)
    assert r["f"] == ""
    assert r["g"] == "10,0,0,40"  # gap keys 2,3 filled with typed zeros
    assert r["h"] == "20,40"
