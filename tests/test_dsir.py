"""DSIR importance-resampling armor (operators/sampling.py
dsir_scores).

The oracled entry (q_sample_dsir) pins DuckDB bit-identity; these pin
the VALUES against an independent Python replay and that the score
actually separates target-like documents from the rest.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from nutdb_spark.operators.sampling import DSIR_DIM, DSIR_SCALE, dsir_scores


def _bucket(feat: str, salt: str = "dsir", dim: int = DSIR_DIM) -> int:
    h = hashlib.md5((salt + feat).encode()).hexdigest()
    return int(h[:15], 16) % dim


def _py_scores(rows: list[tuple[int, str, bool]]) -> dict[int, tuple[int, int]]:
    def feats(text: str) -> list[int]:
        w = [
            t
            for t in re.split(r"\s+", re.sub(r"\s+", " ", text.lower()).strip())
            if t
        ]
        grams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        return [_bucket(f) for f in w + grams]

    per = {i: feats(t) for i, t, _ in rows}
    cnt_raw: dict[int, int] = {}
    cnt_tgt: dict[int, int] = {}
    for (i, _, tgt) in rows:
        for f in per[i]:
            cnt_raw[f] = cnt_raw.get(f, 0) + 1
            if tgt:
                cnt_tgt[f] = cnt_tgt.get(f, 0) + 1
    out = {}
    for (i, _, _) in rows:
        r = sum(
            ((cnt_tgt.get(f, 0) + 1) * DSIR_SCALE) // (cnt_raw[f] + 1)
            for f in per[i]
        )
        out[i] = (len(per[i]), r)
    return out


def test_scores_match_python_replay(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", True),
        (1, "der schnelle braune fuchs springt", False),
        (2, "the dog sleeps under the tree", True),
        (3, "el zorro marron salta sobre el perro", False),
        (4, "", False),
        (5, "   ", True),
        (6, "quick brown fox", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: (r["n_feats"], r["score"])
        for r in dsir_scores(df, "doc_id", "text", F.col("tgt")).collect()
    }
    assert got == _py_scores(rows)


def test_target_like_docs_score_higher(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = dsir_scores(d, "doc_id", "text", F.col("lang") == "en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    # mean per-feature ratio: en docs must beat the non-en mean
    agg = (
        s.filter(F.col("n_feats") > 0)
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(
            (F.sum("score") / F.sum("n_feats")).alias("per_feat")
        )
        .collect()
    )
    per = {r["is_en"]: r["per_feat"] for r in agg}
    assert per[True] > per[False]


# --- global_topk (two-pass histogram cut) ------------------------------------


def _naive_topk(rows, k):
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    return {r[0]: i + 1 for i, r in enumerate(ordered[:k])}


def test_global_topk_matches_naive_window(spark):
    import random

    from nutdb_spark.operators.sampling import global_topk

    rng = random.Random(99)
    # heavy ties, negatives, and both sides of a bucket edge
    rows = [
        (i, rng.choice([-5, -1, 0, 7, 7, 7, 1 << 20, (1 << 20) + 1, 10**9]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, score long")
    for k in (1, 7, 100, 499, 500, 600):
        got = {
            r["k"]: r["rk"]
            for r in global_topk(
                df, F.col("score"), F.col("k"), k
            ).collect()
        }
        assert got == _naive_topk(rows, k), f"k={k}"


def test_global_topk_constant_scores_stay_exact(spark):
    """The degenerate case the r12 advice flagged: every score in one
    histogram bucket (here: constant), so the candidate set is the
    whole corpus — the distributed rank must still be exact and
    key-ordered."""
    from nutdb_spark.operators.sampling import global_topk

    rows = [(i * 13 % 2000, 42) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, score long")
    got = {
        r["k"]: r["rk"]
        for r in global_topk(df, F.col("score"), F.col("k"), 25).collect()
    }
    assert got == _naive_topk(rows, 25)


def test_global_topk_rank_window_is_partitioned(spark):
    """The exact-rank row_number must run per range-partition (pid),
    never as one unpartitioned global window over the candidates."""
    from nutdb_spark.operators.sampling import global_topk

    df = spark.range(0, 1000).selectExpr("id AS k", "42 AS score")
    plan = (
        global_topk(df, F.col("score"), F.col("k"), 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re as _re

    for m in _re.finditer(r"row_number\(\)[^\n]*", plan):
        assert "__pid" in m.group(0), m.group(0)


def test_global_topk_validates_args(spark):
    import pytest as _pytest

    from nutdb_spark.operators.sampling import global_topk

    df = spark.createDataFrame([(1, 1)], "k long, score long")
    with _pytest.raises(ValueError, match="k must be positive"):
        global_topk(df, F.col("score"), F.col("k"), 0)
    with _pytest.raises(ValueError, match="bucket_width"):
        global_topk(df, F.col("score"), F.col("k"), 1, bucket_width=0)


def test_frozen_scores_are_batch_order_independent(spark):
    from nutdb_spark.operators.sampling import (
        dsir_ratio_table,
        dsir_score_against,
    )

    ref = spark.createDataFrame(
        [(0, "the quick brown fox", True), (1, "der braune fuchs", False),
         (2, "the lazy dog", True)],
        "doc_id long, text string, tgt boolean",
    )
    frozen = dsir_ratio_table(ref, "text", F.col("tgt")).localCheckpoint()
    new = spark.createDataFrame(
        [(10, "the quick dog"), (11, "unseen tokens entirely"),
         (12, "")],
        "doc_id long, text string",
    )
    whole = {
        r["doc_id"]: (r["n_feats"], r["score"])
        for r in dsir_score_against(new, "doc_id", "text", frozen).collect()
    }
    # scoring one-by-one (any batch split) gives identical values
    for i in (10, 11, 12):
        one = dsir_score_against(
            new.filter(F.col("doc_id") == i), "doc_id", "text", frozen
        ).collect()[0]
        assert (one["n_feats"], one["score"]) == whole[i], i
    # unseen vocabulary reads neutral: every feature scores SCALE
    from nutdb_spark.operators.sampling import DSIR_SCALE

    n, s = whole[11]
    assert s == n * DSIR_SCALE and n > 0
    assert whole[12] == (0, 0)
