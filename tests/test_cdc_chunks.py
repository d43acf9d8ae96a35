"""Pins for content-defined chunking: determinism, coverage
(chunks reassemble to the input), the shift-resilience property that
motivates CDC over fixed windows, and the dedup counting contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import cdc_chunk_dedup, cdc_chunks


@pytest.fixture(scope="module")
def base_text():
    import random

    rnd = random.Random(20260815)
    return "".join(
        rnd.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(600)
    )


def _chunks(spark, text):
    return spark.createDataFrame([(text,)], "t string").select(
        cdc_chunks(F.col("t")).alias("c")
    ).first()["c"]


def test_chunks_cover_input_and_are_deterministic(spark, base_text):
    c1 = _chunks(spark, base_text)
    c2 = _chunks(spark, base_text)
    assert c1 == c2
    assert "".join(c1) == base_text
    assert len(c1) > 1  # 600 chars at mask 64 must split
    assert _chunks(spark, "") == []
    assert _chunks(spark, "short") == ["short"]


def test_early_insertion_preserves_downstream_chunks(spark, base_text):
    # THE CDC property: prepending content shifts offsets but the
    # chunk set re-synchronizes — most original chunks survive
    # verbatim, which fixed-size windows cannot do
    orig = set(_chunks(spark, base_text))
    shifted = set(_chunks(spark, "zzz inserted prefix " + base_text))
    assert len(orig & shifted) >= len(orig) - 2


def test_dedup_counts_duplicated_spans(spark, base_text):
    df = spark.createDataFrame(
        [(1, base_text), (2, base_text), (3, "unrelated text here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in cdc_chunk_dedup(df, "doc_id", "text").collect()
    }
    # doc 1 is first occurrence everywhere; doc 2 duplicates it fully
    assert out[1]["n_dup"] == 0
    assert out[2]["n_dup"] == out[2]["n_chunks"]
    assert out[2]["dup_chars"] > 0
    assert out[3]["n_dup"] == 0
