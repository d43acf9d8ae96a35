"""Trajectory DTW similarity armor (operators/trajectory.py).

The oracled entry (q_traj_dtw_topk) pins the DuckDB bit-identity;
these pin the DTW VALUES against an independent Python DP on random
series plus the metric-ish properties, and the blocking join's plan
shape.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nutdb_spark.operators.trajectory import (
    dtw_distance,
    dtw_topk,
    user_value_series,
)


def _py_dtw(a, b):
    if not a or not b:
        return None
    inf = 1 << 62
    prev = [0] + [inf] * len(b)
    for x in a:
        cur = [inf]
        for j, y in enumerate(b, 1):
            cur.append(abs(x - y) + min(prev[j], prev[j - 1], cur[-1]))
        prev = cur
    return prev[len(b)]


def test_dtw_matches_python_on_random_series(spark):
    rng = random.Random(4242)
    cases = [
        (
            [rng.randint(-50, 50) for _ in range(rng.randint(1, 12))],
            [rng.randint(-50, 50) for _ in range(rng.randint(1, 12))],
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame(cases, "a array<long>, b array<long>")
    got = [
        r["d"]
        for r in df.select(
            dtw_distance(F.col("a"), F.col("b")).alias("d")
        ).collect()
    ]
    assert got == [_py_dtw(a, b) for a, b in cases]


def test_dtw_properties(spark):
    df = spark.createDataFrame(
        [([1, 2, 3], [1, 2, 3]), ([1, 2, 3], [3, 2, 1]), ([], [1])],
        "a array<long>, b array<long>",
    )
    rows = df.select(
        dtw_distance(F.col("a"), F.col("b")).alias("ab"),
        dtw_distance(F.col("b"), F.col("a")).alias("ba"),
    ).collect()
    assert rows[0]["ab"] == 0  # identity
    assert rows[1]["ab"] == rows[1]["ba"]  # |Δ|-cost DTW is symmetric
    assert rows[2]["ab"] is None and rows[2]["ba"] is None


def test_dtw_batch_matches_python_dp():
    """The vectorized Arrow-stage DP (r13 optimization) must be
    bit-identical to the reference Python DP on random ragged
    batches, including empty-side NULLs."""
    import pandas as pd

    from nutdb_spark.operators.trajectory import _dtw_batch_rows

    rng = random.Random(1313)
    rows = []
    for i in range(200):
        a = [rng.randint(-1000, 1000) for _ in range(rng.randint(0, 12))]
        b = [rng.randint(-1000, 1000) for _ in range(rng.randint(0, 12))]
        rows.append((i, 1000 + i, a, b))
    pdf = pd.DataFrame(rows, columns=["qid", "neighbor_id", "qv", "v"])
    out = pd.concat(list(_dtw_batch_rows(iter([pdf]))))
    got = [None if pd.isna(v) else int(v) for v in out["dtw"]]
    want = [_py_dtw(a, b) for _, _, a, b in rows]
    assert got == want


def test_dtw_topk_matches_column_fold(spark):
    """dtw_topk's Arrow verify must reproduce the original
    dtw_distance column-fold plan row-for-row on a real fixture."""
    from pyspark.sql import Window

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    series = user_value_series(
        ev, "user_id", "event_id", "value", scale=100, max_len=30
    )
    got = dtw_topk(
        series, n_queries=6, k=3, bucket_width=2000, probes=1
    ).orderBy("query_id", "rank").collect()
    env = series.select(
        "user", "v",
        F.expr("((array_min(v) + array_max(v)) div 2) div 2000").alias("b"),
    )
    qs = env.filter(F.col("user") < 6).select(
        F.col("user").alias("qid"), F.col("v").alias("qv"),
        F.explode(F.sequence(F.col("b") - 1, F.col("b") + 1)).alias("b"),
    )
    cand = qs.join(env, "b").filter(F.col("user") != F.col("qid"))
    scored = cand.select(
        "qid", F.col("user").alias("neighbor_id"),
        dtw_distance(F.col("qv"), F.col("v")).alias("dtw"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dtw").asc(), F.col("neighbor_id").asc()
    )
    want = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(F.col("qid").alias("query_id"), "neighbor_id", "dtw", "rank")
        .orderBy("query_id", "rank")
        .collect()
    )
    assert got == want


def test_topk_plan_and_shape(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    series = user_value_series(
        ev, "user_id", "event_id", "value", scale=100, max_len=10
    )
    out = dtw_topk(series, n_queries=4, k=2, bucket_width=4000, probes=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= 2
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
