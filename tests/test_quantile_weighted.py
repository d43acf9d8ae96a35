"""Pins for quantileExactWeighted: the weights-1 ≡ quantileExactLow
consistency contract, rank placement across weight boundaries, EXPLAIN
PIPELINE availability, and randomized armor vs a Python reference.
"""

from __future__ import annotations

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_weighted_quantile_semantics(eng):
    r = eng.sql(
        "select quantileExactWeighted(0.5)(x, w) as a, "
        "quantileExactWeighted(0.5)(x, 1) as b, "
        "quantileExact(0.5)(x) as c, "
        "medianExactWeighted(x, w) as d, "
        "quantileExactWeighted(0.0)(x, w) as lo, "
        "quantileExactWeighted(1.0)(x, w) as hi "
        "from (values (10, 1), (20, 9), (30, 1)) as t(x, w)"
    ).first()
    assert r["a"] == 20  # heavy middle weight dominates
    assert r["b"] == r["c"] == 20  # all-1 weights ≡ quantileExactLow
    assert r["d"] == 20
    assert r["lo"] == 10
    assert r["hi"] == 30


def test_weighted_quantile_randomized_vs_python(spark):
    import random

    from pyspark.sql import functions as F

    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    rnd = random.Random(20260815)
    rows = [
        (g, rnd.randint(-50, 50), rnd.randint(1, 6))
        for g in range(25)
        for _ in range(rnd.randint(1, 30))
    ]
    df = spark.createDataFrame(rows, "g int, x long, w long")
    for level in (0.25, 0.5, 0.9):
        out = {
            r["g"]: r["q"]
            for r in df.groupBy("g")
            .agg(
                PARAMETRIC_AGGS["quantileExactWeighted"](
                    [level], F.col("x"), F.col("w")
                ).alias("q")
            )
            .collect()
        }
        by_g: dict[int, list] = {}
        for g, x, w in rows:
            by_g.setdefault(g, []).extend([x] * w)
        for g, expanded in by_g.items():
            expanded.sort()
            import math

            t = math.floor(level * (len(expanded) - 1))
            assert out[g] == expanded[t], (g, level)


def test_explain_pipeline(eng):
    rows = eng.sql("explain pipeline select count() from events").collect()
    text = "\n".join(r[0] for r in rows)
    assert "HashAggregate" in text or "Aggregate" in text
