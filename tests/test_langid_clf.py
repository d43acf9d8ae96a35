"""Hashed-linear language-ID armor (operators/langid_clf.py).

The oracled entries (q_text_langid_clf, sql_table_fn_langid,
q_sample_ccnet_langid) pin DuckDB bit-identity; these pin the model
against an independent Python replay, the accuracy claim, the tie
order, and the plan shape (broadcast weight join, no Python nodes).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from nutdb_spark.operators.langid_clf import (
    LANGID_BIAS,
    LANGID_DIM,
    LANGID_LANGS,
    LANGID_ROWS,
    LANGID_SALT,
    langid_scores,
)

_W = {row[0]: row[1:] for row in LANGID_ROWS}


def _py_predict(text: str) -> tuple[str, int]:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    ws = [w for w in norm.split(" ") if w]
    feats = ws + [a + " " + b for a, b in zip(ws, ws[1:])]
    scores = list(LANGID_BIAS)
    for f in feats:
        h = hashlib.md5((LANGID_SALT + f).encode()).hexdigest()
        b = int(h[:15], 16) % LANGID_DIM
        row = _W.get(b)
        if row:
            scores = [s + w for s, w in zip(scores, row)]
    best = max(
        range(len(LANGID_LANGS)), key=lambda i: (scores[i], -i)
    )
    return LANGID_LANGS[best], scores[best]


def test_matches_python_replay(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    rows = langid_scores(d, "doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(rows) == len(texts)
    for r in rows:
        want = _py_predict(texts[r["doc_id"]])
        assert (r["lang_pred"], r["score"]) == want, r["doc_id"]


def test_empty_doc_is_bias_argmax(spark):
    df = spark.createDataFrame([(0, ""), (1, "   ")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in langid_scores(df, "doc_id", "text").collect()}
    best = max(
        range(len(LANGID_LANGS)), key=lambda i: (LANGID_BIAS[i], -i)
    )
    for r in rows.values():
        assert r["lang_pred"] == LANGID_LANGS[best]
        assert r["score"] == LANGID_BIAS[best]


def test_committed_model_accuracy_gate(spark):
    """The docstring claims 96.6% on the sf0.01 training corpus —
    hold a ≥0.9 floor so weight-table regressions are loud."""
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pred = langid_scores(d, "doc_id", "text")
    agg = (
        pred.join(d.select("doc_id", "lang"), "doc_id")
        .select((F.col("lang_pred") == F.col("lang")).cast("int").alias("ok"))
        .agg(F.sum("ok").alias("hit"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert agg["hit"] / agg["n"] >= 0.9


def test_plan_broadcasts_weights_no_python(spark):
    d = spark.range(0, 100).selectExpr(
        "id AS doc_id", "'the quick brown fox' AS text"
    )
    plan = (
        langid_scores(d, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
