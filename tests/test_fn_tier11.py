"""tier-11 grab-bag pins: factorial guard edges, unbin round-trip and
invalid-input NULLs, extractKeyValuePairs parsing edges, pointInPolygon
vs a python ray-casting reference on a non-convex polygon, and the
geohash encode/decode round-trip property (decode returns the cell
center, so re-encoding the decoded point reproduces the hash).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import SCALAR_FNS


def py_pip(x, y, poly):
    n = len(poly)
    inside = False
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return 1 if inside else 0


POLY = [(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)]


def _poly_col():
    return F.array(
        *[F.array(F.lit(a).cast("long"), F.lit(b).cast("long")) for a, b in POLY]
    )


def test_point_in_polygon_matches_reference(spark):
    rng = random.Random(3)
    pts = [(rng.randint(-3, 13), rng.randint(-3, 13)) for _ in range(120)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x",
        "y",
        SCALAR_FNS["pointInPolygon"](
            F.array(F.col("x"), F.col("y")), _poly_col()
        ).alias("p"),
    ).collect()
    for r in rows:
        assert r["p"] == py_pip(r["x"], r["y"], POLY), (r["x"], r["y"])


def test_factorial_edges(spark):
    r = spark.range(1).select(
        SCALAR_FNS["factorial"](F.lit(0)).alias("a"),
        SCALAR_FNS["factorial"](F.lit(1)).alias("b"),
        SCALAR_FNS["factorial"](F.lit(20)).alias("c"),
        SCALAR_FNS["factorial"](F.lit(21)).alias("d"),
        SCALAR_FNS["factorial"](F.lit(-1)).alias("e"),
    ).first()
    assert (r["a"], r["b"], r["c"]) == (1, 1, 2432902008176640000)
    assert r["d"] is None and r["e"] is None


def test_unbin_edges(spark):
    r = spark.range(1).select(
        SCALAR_FNS["unbin"](SCALAR_FNS["bin"](F.lit(987654321))).alias("rt"),
        SCALAR_FNS["unbin"](F.lit("0")).alias("z"),
        SCALAR_FNS["unbin"](F.lit("102")).alias("bad"),
        SCALAR_FNS["unbin"](F.lit("")).alias("empty"),
        SCALAR_FNS["unbin"](F.lit("1" * 64)).alias("over"),
    ).first()
    assert r["rt"] == 987654321 and r["z"] == 0
    assert r["bad"] is None and r["empty"] is None and r["over"] is None


def test_extract_kv_pairs_edges(spark):
    r = spark.range(1).select(
        F.map_entries(
            SCALAR_FNS["extractKeyValuePairs"](
                F.lit(" a : 1 ,junk, b:2, a:9, c:x:y ,")
            )
        ).alias("kv")
    ).first()
    got = {e["key"]: e["value"] for e in r["kv"]}
    # first duplicate wins, junk (no colon) dropped, values keep
    # everything after the FIRST colon, whitespace trimmed
    assert got == {"a": "1", "b": "2", "c": "x:y"}


def test_geohash_known_vectors_and_roundtrip(spark):
    # ezs42 is the canonical example cell; Palermo is sqc8b49
    r = spark.range(1).select(
        SCALAR_FNS["geohashEncode"](
            F.lit(-5.60302734375), F.lit(42.60498046875), F.lit(5)
        ).alias("g1"),
        SCALAR_FNS["geohashEncode"](
            F.lit(13.361389), F.lit(38.115556), F.lit(7)
        ).alias("g2"),
    ).first()
    assert r["g1"] == "ezs42" and r["g2"] == "sqc8b49"

    rng = random.Random(11)
    pts = [
        (rng.uniform(-179.9, 179.9), rng.uniform(-89.9, 89.9))
        for _ in range(60)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    gh = SCALAR_FNS["geohashEncode"](F.col("lon"), F.col("lat"), F.lit(6))
    re_enc = SCALAR_FNS["geohashEncode"](
        SCALAR_FNS["geohashDecode"](F.lit(1), gh),
        SCALAR_FNS["geohashDecode"](F.lit(2), gh),
        F.lit(6),
    )
    rows = df.select(gh.alias("g"), re_enc.alias("g2")).collect()
    for r in rows:
        assert r["g"] == r["g2"]  # cell center re-encodes to same cell


# --- tier-12 pins -------------------------------------------------------------


def test_tier12_scalars(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    r = spark.createDataFrame(
        [(dt.datetime(2024, 3, 5, 13, 45, 7), "hello world")],
        "ts timestamp, s string",
    ).select(
        SCALAR_FNS["toTime"](F.col("ts")).alias("tt"),
        SCALAR_FNS["widthBucket"](
            F.lit(5.35), F.lit(0.0), F.lit(10.0), F.lit(5)
        ).alias("wb"),
        SCALAR_FNS["multiMatchAny"](
            F.col("s"), F.array(F.lit("^z"), F.lit("wor.d"))
        ).alias("mm"),
        SCALAR_FNS["multiMatchAnyIndex"](
            F.col("s"), F.array(F.lit("^z"), F.lit("wor.d"))
        ).alias("mmi"),
        SCALAR_FNS["regexpExtract"](
            F.col("s"), F.lit("h(\\w+)"), F.lit(1)
        ).alias("rex"),
        F.size(SCALAR_FNS["emptyArrayInt64"]()).alias("ea"),
        SCALAR_FNS["arrayShuffle"](
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
        ).alias("shuf"),
        SCALAR_FNS["arrayRandomSample"](
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)), F.lit(2)
        ).alias("samp"),
    ).first()
    assert r["tt"] == dt.datetime(1970, 1, 2, 13, 45, 7)
    assert r["wb"] == 3
    assert r["mm"] is True and r["mmi"] == 2
    assert r["rex"] == "ello"
    assert r["ea"] == 0
    assert sorted(r["shuf"]) == [1, 2, 3, 4]  # a permutation
    assert len(r["samp"]) == 2 and set(r["samp"]) <= {1, 2, 3, 4}
    assert r["samp"] == r["shuf"][:2]  # sample = shuffle prefix


def test_any_heavy_deterministic_mode(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.functions.registry import AGGREGATE_FNS

    df = spark.createDataFrame(
        [(1, v) for v in (5, 3, 5, 3, 7)] + [(2, v) for v in (9,)],
        "g int, x int",
    )
    rows = {
        r["g"]: r["ah"]
        for r in df.groupBy("g")
        .agg(AGGREGATE_FNS["anyHeavy"](F.col("x")).alias("ah"))
        .collect()
    }
    assert rows[1] == 3  # 5 and 3 tie at 2 — smallest value wins
    assert rows[2] == 9


def test_array_levenshtein_and_sum_kahan(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.functions.registry import AGGREGATE_FNS

    r = spark.range(1).select(
        SCALAR_FNS["arrayLevenshtein"](
            F.array(F.lit(1), F.lit(2), F.lit(3)),
            F.array(F.lit(2), F.lit(3), F.lit(4)),
        ).alias("a"),
        SCALAR_FNS["arrayLevenshtein"](
            F.array(F.lit(1), F.lit(2)),
            F.slice(F.array(F.lit(1)), 1, 0),
        ).alias("b"),
        SCALAR_FNS["arrayLevenshtein"](
            F.array(F.lit(5), F.lit(6)), F.array(F.lit(5), F.lit(6))
        ).alias("c"),
    ).first()
    assert (r["a"], r["b"], r["c"]) == (2, 2, 0)

    # Kahan: the classic 1 + 1e100 + 1 - 1e100 pattern is beyond even
    # compensation; instead pin that value-ordered compensated sum of
    # 0.1 x 10 beats nothing but EQUALS the fold of sorted values
    df = spark.createDataFrame([(0.1,)] * 10, "x double")
    got = df.agg(
        AGGREGATE_FNS["sumKahan"](F.col("x")).alias("s")
    ).first()["s"]
    import math

    ref_s, ref_c = 0.0, 0.0
    for v in [0.1] * 10:
        y = v - ref_c
        t = ref_s + y
        ref_c = (t - ref_s) - y
        ref_s = t
    assert got == ref_s and math.isclose(got, 1.0, rel_tol=1e-15)

    rows = spark.createDataFrame(
        [(1, 3), (1, 3), (1, 9), (2, 4)], "g int, x int"
    ).groupBy("g").agg(
        AGGREGATE_FNS["groupBitmap"](F.col("x")).alias("n")
    ).collect()
    assert {r["g"]: r["n"] for r in rows} == {1: 2, 2: 1}
