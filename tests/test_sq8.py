"""SQ8 scalar-quantization armor (operators/similarity.py sq8_*).

The oracled entry (q_sim_topk_sq8) pins DuckDB bit-identity; these pin
the quantization algebra (code range, degenerate dims, Python replay)
and the claims the oracle can't see: recall against the exact
baseline, and the zero-Python-nodes plan.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nutdb_spark.operators.similarity import (
    SCALE,
    sq8_codes,
    sq8_stats,
    topk_sq8,
)

SF01 = "/root/testdata/sf0.01"


def test_codes_match_python_replay_and_range(spark):
    vecs = [
        [0.5, -1.0, 0.0, 3.25],
        [1.0, 1.0, 0.0, -2.5],
        [-0.25, 0.125, 0.0, 0.75],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, emb array<float>"
    )
    base = df.select(
        "id",
        F.transform(
            "emb", lambda x: F.floor(x.cast("double") * SCALE).cast("long")
        ).alias("__v"),
    )
    stats = sq8_stats(base, dim=4)
    got = {
        r["id"]: r["c"]
        for r in base.crossJoin(F.broadcast(stats))
        .select(
            "id",
            sq8_codes(F.col("__v"), F.col("__mins"), F.col("__maxs")).alias(
                "c"
            ),
        )
        .collect()
    }
    s = [[math.floor(x * SCALE) for x in v] for v in vecs]
    mins = [min(col) for col in zip(*s)]
    maxs = [max(col) for col in zip(*s)]
    for i, v in enumerate(s):
        want = [
            math.floor((x - mn) * 255 / max(1, mx - mn)) - 128
            for x, mn, mx in zip(v, mins, maxs)
        ]
        assert got[i] == want, i
    # range: centered int8; degenerate dim (all zeros) codes to -128
    for codes in got.values():
        assert all(-128 <= c <= 127 for c in codes)
        assert codes[2] == -128


def test_sq8_recall_vs_exact_baseline(spark):
    from nutdb_spark.operators.similarity import topk_bruteforce

    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(e, q, "vec_id", "embedding", k=5).collect()
    }
    sq8 = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_sq8(e, q, "vec_id", "embedding", k=5).collect()
    }
    recall = len(exact & sq8) / len(exact)
    # 32 candidates from int8 codes over 500 vectors: demand >= 0.9
    assert recall >= 0.9, recall


def test_sq8_entry_plan_is_jvm_pure(spark):
    from nutdb_spark.suite import QUERIES

    plan = (
        QUERIES["q_sim_topk_sq8"](spark, SF01)
        ._jdf.queryExecution()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "mapInPandas" not in plan
