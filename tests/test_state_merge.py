"""Pins for the -State/-Merge combinator pair: associativity of the
exact members across ANY re-bucketing, and the HLL-sketch uniq pair
(mergeability + estimate accuracy) that the hash oracle can't cover.
"""

from __future__ import annotations

import tempfile

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def test_state_merge_equals_direct(eng):
    merged = eng.sql(
        "with st as (select l_orderkey, l_linenumber, "
        "  sumState(l_quantity) as s, avgState(l_suppkey) as a, "
        "  countState() as c "
        "from lineitem group by l_orderkey, l_linenumber) "
        "select sumMerge(s) as q, avgMerge(a) as av, "
        "countMerge(c) as n from st"
    ).first()
    direct = eng.sql(
        "select sum(l_quantity) as q, avg(l_suppkey) as av, "
        "count() as n from lineitem"
    ).first()
    assert merged["q"] == direct["q"]
    assert merged["n"] == direct["n"]
    assert merged["av"] == pytest.approx(direct["av"], rel=1e-12)


def test_uniq_state_merge_sketch(eng):
    """Per-group HLL sketches must UNION to (approximately) the global
    distinct count — mergeability is the whole point of the state —
    and the estimate must sit within the sketch's documented error
    band (lgK=12 → ~1.6% rse; allow 5%)."""
    est = eng.sql(
        "with st as (select l_linestatus, uniqState(l_partkey) as u "
        "from lineitem group by l_linestatus) "
        "select uniqMerge(u) as u from st"
    ).first()["u"]
    exact = eng.sql(
        "select countUnique(l_partkey) as u from lineitem"
    ).first()["u"]
    assert abs(est - exact) / exact < 0.05


def test_group_array_state_merge(eng):
    rows = eng.sql(
        "with st as (select l_orderkey, "
        "  groupArrayState(l_linenumber) as g "
        "from lineitem where l_orderkey < 10 group by l_orderkey) "
        "select arrayLength(groupArrayMerge(g)) as n from st"
    ).first()
    direct = eng.sql(
        "select count() as n from lineitem where l_orderkey < 10"
    ).first()
    assert rows["n"] == direct["n"]
