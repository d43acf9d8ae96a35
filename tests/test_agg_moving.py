"""Pins for the moving-window aggregate family: warm-up semantics,
sumMapFiltered key restriction, the 2-arg determinism contract, and
randomized armor for exponentialMovingAverage (PYTEST_ONLY — 2^x is
libm) against a pure-Python reference.
"""

from __future__ import annotations

import math

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_moving_sum_and_avg_warmup(eng):
    r = eng.sql(
        "select arrayStringConcat(arrayMap(x -> toString(x), "
        "  groupArrayMovingSum(3)(v, t)), ',') as ms, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  groupArrayMovingAvg(2)(v, t)), ',') as ma "
        "from (select arrayJoin([1, 2, 3, 4]) as v, "
        "      arrayJoin([1, 2, 3, 4]) as t) where v = t"
    ).first()
    # trailing-3 sums: 1, 1+2, 1+2+3, 2+3+4
    assert r["ms"] == "1,3,6,9"
    # avg divides by k even during warm-up (CH semantics)
    assert r["ma"] == "0.5,1.5,2.5,3.5"


def test_moving_sum_orders_by_time_key(eng):
    a = eng.sql(
        "select arrayStringConcat(arrayMap(x -> toString(x), "
        "  groupArrayMovingSum(2)(v, t)), ',') as ms "
        "from (select arrayJoin([10, 30, 20]) as v, "
        "      arrayJoin([1, 3, 2]) as t) where v = t * 10"
    ).first()["ms"]
    assert a == "10,30,50"  # sorted by t: 10,20,30 → 10, 30, 50


def test_sum_map_filtered_drops_other_keys(eng):
    r = eng.sql(
        "select arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapKeys(sumMapFiltered('a', 'b')(k, v))), ',') as ks, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  mapValues(sumMapFiltered('a', 'b')(k, v))), ',') as vs "
        "from (select ['a', 'b', 'c', 'a'] as k, "
        "      [toInt64(1), toInt64(2), toInt64(7), toInt64(3)] as v)"
    ).first()
    assert r["ks"] == "a,b"
    assert r["vs"] == "4,2"  # 'c' never enters the fold


def test_ema_randomized_vs_python(spark):
    import random

    from pyspark.sql import functions as F

    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    rnd = random.Random(20260815)
    rows = [
        (g, float(rnd.randint(0, 1000)), float(rnd.randint(0, 100)))
        for g in range(20)
        for _ in range(rnd.randint(1, 12))
    ]
    df = spark.createDataFrame(rows, "g int, t double, v double")
    out = {
        r["g"]: r["e"]
        for r in df.groupBy("g")
        .agg(
            PARAMETRIC_AGGS["exponentialMovingAverage"](
                [50.0], F.col("v"), F.col("t")
            ).alias("e")
        )
        .collect()
    }

    by_g: dict[int, list] = {}
    for g, t, v in rows:
        by_g.setdefault(g, []).append((t, v))
    for g, pts in by_g.items():
        tmax = max(t for t, _ in pts)
        den = sum(2.0 ** ((t - tmax) / 50.0) for t, _ in pts)
        num = sum(v * 2.0 ** ((t - tmax) / 50.0) for t, v in pts)
        assert out[g] == pytest.approx(num / den, rel=1e-12), g
