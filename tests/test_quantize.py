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
