"""Sketch armor (operators/sketch.py).

The oracled entries (q_sketch_hll, q_sketch_hll_merge,
q_sketch_cms_heavy) pin DuckDB bit-identity; these pin the register
construction against an independent Python replay, the merge algebra,
the CMS one-sided-error contract on adversarial inputs, the estimator
error on the real fixture, and the plan shape (no Python nodes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nutdb_spark.operators.sketch import (
    cms_estimate,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF01 = "/root/testdata/sf0.01"


def _base60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_registers(values, p: int) -> dict[int, int]:
    wbits = 60 - p
    regs: dict[int, int] = {}
    for v in values:
        b = _base60(v)
        idx = b % (1 << p)
        w = b >> p
        rank = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
        if rank > regs.get(idx, 0):
            regs[idx] = rank
    return regs


def test_hll_registers_match_python_replay(spark):
    vals = list(range(500)) + ["x", "y", "répé"]
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "v string"
    ).select(F.lit("g").alias("g"), "v")
    got = {
        (r["idx"], r["m"])
        for r in hll_registers(df, ["g"], F.col("v"), p=8).collect()
    }
    want = set(_py_registers([str(v) for v in vals], 8).items())
    assert got == want


def test_hll_merge_equals_direct(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("v"),
        F.pmod(F.col("id") * 7, F.lit(5)).alias("shard"),
    )
    direct = hll_registers(df, ["g"], F.col("v"), p=8)
    sharded = hll_registers(df, ["g", "shard"], F.col("v"), p=8)
    merged = hll_merge(sharded.drop("shard"), ["g"])
    a = {tuple(r) for r in direct.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b


def test_hll_estimate_error_on_fixture(spark):
    # 256 registers -> sigma ~ 1.04/sqrt(256) = 6.5%; demand < 3 sigma.
    # The sketched value (distinct user-days, ~1600 per group) sits in
    # the raw-estimator regime (> 2.5·m) — below that the textbook
    # algorithm switches to linear counting, which is out of oracle
    # scope (libm ln), so the suite entry deliberately stays here.
    e = spark.read.parquet(f"{SF01}/events.parquet")
    uday = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.to_date("ts").cast("string"),
    )
    regs = hll_registers(e, ["event_type"], uday, p=8)
    est = hll_estimate(regs, ["event_type"], p=8)
    exact = e.groupBy("event_type").agg(F.count_distinct(uday).alias("x"))
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert r["x"] > 2.5 * 256, "fixture left the raw-estimator regime"
        assert abs(r["est"] - r["x"]) / r["x"] < 0.20, r


def test_cms_never_underestimates_and_merges(spark):
    # adversarial: heavy skew + many singletons colliding into buckets
    vals = ["hot"] * 400 + [f"w{i}" for i in range(3000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v string"
    )
    cms = cms_table(df, F.col("v"), depth=4, width=64)
    keys = spark.createDataFrame(
        [("hot", 400), ("w17", 1), ("absent", 0)], "k string, x long"
    )
    got = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(
            cms, keys, F.col("k"), depth=4, width=64
        ).collect()
    }
    assert got["hot"] >= 400
    assert got["w17"] >= 1
    assert got["absent"] >= 0
    # merge = counter sum: shard the stream, sum sketches, re-probe
    h1 = cms_table(df.filter(F.col("i") % 2 == 0), F.col("v"), depth=4, width=64)
    h2 = cms_table(df.filter(F.col("i") % 2 == 1), F.col("v"), depth=4, width=64)
    summed = (
        h1.unionByName(h2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = {tuple(r) for r in cms.collect()}
    merged = {tuple(r) for r in summed.collect()}
    assert direct == merged


def test_sketch_entries_have_no_python_nodes(spark):
    from nutdb_spark.suite import QUERIES

    for name in ("q_sketch_hll", "q_sketch_hll_merge", "q_sketch_cms_heavy"):
        plan = QUERIES[name](spark, SF01)._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan, name
        assert "mapInPandas" not in plan, name


def test_hll_setops_bounds_on_fixture(spark):
    from nutdb_spark.suite import QUERIES

    r = QUERIES["q_sketch_hll_setops"](spark, SF01).collect()[0]
    # register-max dominance is exact algebra: the union sketch's
    # registers are >= each side's, so its estimate is too
    assert r["est_union"] >= r["est_a"]
    assert r["est_union"] >= r["est_b"]
    assert r["est_union"] <= r["est_a"] + r["est_b"]
    # inclusion-exclusion intersection: loose by design (the
    # documented caveat) but must be in the right ballpark
    assert abs(r["est_inter"] / r["exact_inter"] - 1) < 0.5


def test_cms_join_size_estimate_on_fixture(spark):
    from nutdb_spark.suite import QUERIES

    r = QUERIES["q_sketch_join_size"](spark, SF01).collect()[0]
    assert r["never_under"]
    assert r["exact_size"] > 0
    # collision mass ~ |a|1*|b|1/w: at width 4096 over the fixture's
    # 15k x 10k value streams that is ~36k on a ~96k true size — pin
    # the estimate inside 2x (the heavy-hitter width 512 would sit at
    # ~4x, which is WHY the entry widens the sketch)
    assert r["est_size"] < 2.0 * r["exact_size"], r
