"""Z-order layout armor (operators/layout.py).

The oracled entry (q_layout_zorder) pins DuckDB bit-identity; these
pin the Morton interleave against a Python replay, bucketization
bounds, and the pruning claims themselves (each linear layout fails
its cross dimension; z-order prunes every box at least as well as the
better linear and strictly dominates on the 2-D box).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nutdb_spark.operators.layout import zorder_key

SF01 = "/root/testdata/sf0.01"


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_replay(spark):
    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y, 8), (x, y)
    assert got[(255, 255)] == (1 << 16) - 1


def test_zorder_tiles_are_rectangles(spark):
    # every aligned 2^(2k) key range must span a 2^k x 2^k box — the
    # property that makes per-file min/max spans narrow in BOTH dims
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    ).select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=5).alias("z")
    )
    tiles = (
        df.groupBy(F.shiftright("z", 4).alias("t"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(tiles) == 64
    for r in tiles:
        assert r["n"] == 16 and r["dx"] == 3 and r["dy"] == 3, r


def test_pruning_claims_on_fixture(spark):
    from nutdb_spark.suite import QUERIES

    rows = {
        (r["layout"], r["box"]): r
        for r in QUERIES["q_layout_zorder"](spark, SF01).collect()
    }
    # each linear layout reads the whole table on its cross dimension
    assert rows[("linear_cust", "date_narrow")]["files_hit"] == 64
    assert rows[("linear_date", "cust_narrow")]["files_hit"] == 64
    # z-order prunes every box; never worse than the better linear
    for box in ("cust_narrow", "date_narrow", "both_narrow"):
        z = rows[("zorder", box)]["files_hit"]
        best_linear = min(
            rows[("linear_cust", box)]["files_hit"],
            rows[("linear_date", box)]["files_hit"],
        )
        assert z < 64 and z <= best_linear, (box, z, best_linear)
    # and strictly dominates when the box is narrow in BOTH dims
    assert (
        rows[("zorder", "both_narrow")]["files_hit"]
        < rows[("linear_cust", "both_narrow")]["files_hit"]
    )


def test_zorder_entry_plan_is_jvm_pure(spark):
    from nutdb_spark.suite import QUERIES

    plan = (
        QUERIES["q_layout_zorder"](spark, SF01)
        ._jdf.queryExecution()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan
