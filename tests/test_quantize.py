"""int8 quantization invariants (operators/similarity.py quantize_int8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nutdb_spark.operators.similarity import SCALE, quantize_int8, scaled


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<float>",
    )


def test_quantize_bounds_and_reconstruction(spark):
    vecs = [
        [0.5, -0.25, 0.125, -1.0],
        [0.001, 0.002, -0.003, 0.004],
        [1.0, 1.0, 1.0, 1.0],
    ]
    df = _vec_df(spark, vecs)
    q = quantize_int8(df, "id", "v")
    rows = {
        r["id"]: r
        for r in q.join(
            df.select("id", scaled(F.col("v")).alias("s")), "id"
        ).collect()
    }
    for i, _ in enumerate(vecs):
        r = rows[i]
        amax = r["amax_scaled"]
        assert amax == max(abs(x) for x in r["s"])
        for qc, sc in zip(r["q8"], r["s"]):
            assert -127 <= qc <= 127
            # floor(s*127/amax) ⇒ dequantized value within one
            # quantization step of the exact scaled component
            deq = qc * amax / 127.0
            assert abs(deq - sc) <= amax / 127.0 + 1e-9
        # max-magnitude component saturates
        assert any(abs(qc) == 127 for qc in r["q8"])


def test_quantize_zero_vector(spark):
    df = _vec_df(spark, [[0.0, 0.0, 0.0]])
    r = quantize_int8(df, "id", "v").collect()[0]
    assert r["amax_scaled"] == 0
    assert list(r["q8"]) == [0, 0, 0]


def test_quantize_is_projection_only(spark):
    df = _vec_df(spark, [[0.1, -0.2]])
    plan = (
        quantize_int8(df, "id", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_quantize_scale_constant_matches_convention():
    assert SCALE == 10_000_000


def test_truncate_embed_roundtrip(spark):
    import math

    from pyspark.sql import functions as F

    from nutdb_spark.operators.similarity import truncate_embed

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0]), (2, [0.0, 0.0, 5.0])],
        "id int, v array<float>",
    )
    out = {r["id"]: r for r in truncate_embed(df, "id", "v", k=2).collect()}
    # scaled head: [3e7, 4e7]; ss_k = 25e14; unit = [0.6, 0.8]
    r1 = out[1]
    assert r1["trunc_scaled"] == [30000000, 40000000]
    assert r1["ss_k"] == 25 * 10**14
    assert abs(r1["unit"][0] - 0.6) < 1e-12 and abs(r1["unit"][1] - 0.8) < 1e-12
    assert abs(math.fsum(x * x for x in r1["unit"]) - 1.0) < 1e-12
    # all-zero head → NULL unit, zero energy
    r2 = out[2]
    assert r2["ss_k"] == 0 and r2["unit"] is None


def test_truncate_embed_no_shuffle(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.similarity import truncate_embed

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        truncate_embed(e, "vec_id", "embedding", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# --- IVF-int8 probe (topk_ivf_int8) ----------------------------------------


def test_ivf_int8_recall_floor_vs_exact(spark):
    """The int8-probe IVF must hold recall@5 within 0.05 of the exact
    multi-probe IVF on the sf0.01 fixture (it measures equal there —
    the exact rescore recovers the ranking; this floor leaves room for
    fixture drift without letting the quantized index silently rot)."""
    from nutdb_spark.suite.similarity import q_sim_recall_pq

    rows = {
        r["method"]: r["recall"]
        for r in q_sim_recall_pq(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows["pq2"] >= rows["ivf2"] - 0.05
    assert rows["pq2"] >= 0.8


def test_ivf_int8_index_drops_full_vectors(spark):
    """The quantized index frame feeding the candidate cogroup must
    not carry the full-precision vectors — that IS the bytes saving.
    Pin it structurally: the analyzed plan of the PQ entry contains
    exactly one FlatMapCoGroups whose corpus side projects the q8
    transform, and the rescore joins broadcast the candidate set."""
    from nutdb_spark.suite.similarity import q_sim_topk_ivf_pq

    df = q_sim_topk_ivf_pq(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
