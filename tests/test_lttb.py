"""Randomized armor for largestTriangleThreeBuckets: 40 seeded random
series through ONE Spark job vs a pure-Python LTTB reference with the
same bucket-bound and tie (first-max-wins) conventions, plus the
small-input passthrough pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import PARAMETRIC_AGGS


def _ref_lttb(pts, n):
    pts = sorted(pts)
    N = len(pts)
    if N <= n:
        return pts
    m = n - 2
    sel = [pts[0]]
    li = 0  # 0-based index of last selected
    for i in range(1, m + 1):
        lo = 2 + ((i - 1) * (N - 2)) // m  # 1-based bucket bounds
        hi = 1 + (i * (N - 2)) // m
        if i < m:
            nlo, nhi = 2 + (i * (N - 2)) // m, 1 + ((i + 1) * (N - 2)) // m
        else:
            nlo = nhi = N
        nxt = pts[nlo - 1:nhi]
        cx = sum(p[0] for p in nxt) / len(nxt)
        cy = sum(p[1] for p in nxt) / len(nxt)
        ax, ay = pts[li]
        best_a, best_j = -1.0, 0
        for j in range(lo, hi + 1):
            px, py = pts[j - 1]
            a = abs((ax - cx) * (py - ay) - (ax - px) * (cy - ay))
            if a > best_a:
                best_a, best_j = a, j
        sel.append(pts[best_j - 1])
        li = best_j - 1
    sel.append(pts[-1])
    return sel


def test_lttb_randomized_vs_python(spark):
    import random

    rnd = random.Random(20260815)
    series = {
        g: sorted(
            {
                (rnd.randint(0, 10_000), rnd.randint(-500, 500))
                for _ in range(rnd.randint(1, 60))
            }
        )
        for g in range(40)
    }
    rows = [(g, x, y) for g, pts in series.items() for x, y in pts]
    df = spark.createDataFrame(rows, "g int, x long, y long")
    out = {
        r["g"]: [(p["_1"], p["_2"]) for p in r["lt"]]
        for r in df.groupBy("g")
        .agg(
            PARAMETRIC_AGGS["largestTriangleThreeBuckets"](
                [8], F.col("x"), F.col("y")
            ).alias("lt")
        )
        .collect()
    }
    for g, pts in series.items():
        # x values are unique per group (set + sort), so the sorted
        # collect order is deterministic
        xs = [x for x, _ in pts]
        assert len(xs) == len(set(xs))
        assert out[g] == _ref_lttb(pts, 8), g


def test_lttb_passthrough_and_endpoints(spark):
    df = spark.createDataFrame(
        [(1, i, i * i) for i in range(5)], "g int, x long, y long"
    )
    lt = (
        df.groupBy("g")
        .agg(
            PARAMETRIC_AGGS["lttb"]([10], F.col("x"), F.col("y")).alias("lt")
        )
        .first()["lt"]
    )
    assert [(p["_1"], p["_2"]) for p in lt] == [(i, i * i) for i in range(5)]

    with pytest.raises(ValueError, match="n >= 3"):
        PARAMETRIC_AGGS["lttb"]([2], F.col("x"), F.col("y"))
