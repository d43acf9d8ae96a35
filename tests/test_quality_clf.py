"""Hashed-linear quality-classifier armor (operators/quality_clf.py).

The oracled entry (q_text_classifier) pins the DuckDB bit-identity;
these pin the VALUES against an independent Python replay, the
trainer's reproducibility of the committed weights, the dialect
surface, and the zero-Python plan.
"""

from __future__ import annotations

import hashlib
import re
import sys

from pyspark.sql import functions as F

from nutdb_spark.operators.quality_clf import (
    QCLF_BIAS,
    QCLF_DIM,
    QCLF_SALT,
    QCLF_WEIGHTS,
    classifier_keep,
    classifier_logit,
)


def _py_logit(text: str) -> int:
    logit = QCLF_BIAS
    for w in re.split(r"\s+", text.strip()):
        if w:
            h = hashlib.md5((QCLF_SALT + w).encode()).hexdigest()
            logit += QCLF_WEIGHTS[int(h[:15], 16) % QCLF_DIM]
    return logit


def test_logit_matches_python_replay(spark):
    texts = [
        "",
        "   ",
        "slow slow slow",
        "order vector batch merge join",
        "the key agg row scan slow fast table value part hash",
        "unseen words not in the training corpus zzz qqq",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        classifier_logit(F.col("t")).alias("l"),
        classifier_keep(F.col("t")).alias("k"),
    ).collect()
    for t, r in zip(texts, got):
        assert r["l"] == _py_logit(t), repr(t)
        assert r["k"] == (_py_logit(t) > 0), repr(t)


def test_trainer_reproduces_committed_weights():
    sys.path.insert(0, "tools")
    import duckdb
    from train_quality_clf import train

    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "'/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    w, b, acc = train(rows)
    assert tuple(w) == QCLF_WEIGHTS
    assert b == QCLF_BIAS
    assert acc >= 0.9  # the committed model is a real fit, not noise


def test_dialect_surface(spark):
    from nutdb_spark.engine import NutEngine
    import tempfile

    eng = NutEngine(
        spark,
        data_dir="/root/testdata/sf0.001",
        catalog_dir=tempfile.mkdtemp(),
    )
    rows = eng.sql(
        "SELECT doc_id, qualityLogit(text) AS l, qualityKeep(text) AS k "
        "FROM documents ORDER BY doc_id LIMIT 5"
    ).collect()
    for r in rows:
        assert isinstance(r["l"], int)
        assert r["k"] == (r["l"] > 0)


def test_no_python_nodes_and_scan_shaped_plan(spark):
    from nutdb_spark.suite import QUERIES

    plan = (
        QUERIES["q_text_classifier"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    # pure projection + the ORDER BY's single Exchange: no join, no agg
    assert "Join" not in plan and "HashAggregate" not in plan
