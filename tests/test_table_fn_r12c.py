"""Dialect-surface armor for the round-12 session-3 table functions
(gopherQuality / dsirScores / bpeTrain / dedupSubstrings): arity and
argument validation raise LoweringError; values agree with the Python
operators the functions wrap (each already oracled via its own suite
entry — these pin the dialect plumbing, not the math).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nutdb_spark.frontend.lower import LoweringError


@pytest.fixture(scope="module")
def eng(spark):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir="/root/testdata/sf0.001")


def test_gopher_quality_fn(eng, spark):
    with pytest.raises(LoweringError, match="gopherQuality takes"):
        eng.sql("select * from gopherQuality('documents', 'doc_id')")
    with pytest.raises(LoweringError, match="stoplist must be one of"):
        eng.sql(
            "select * from gopherQuality('documents', 'doc_id', "
            "'text', 'klingon')"
        )
    got = eng.sql(
        "select doc_id, passes from "
        "gopherQuality('documents', 'doc_id', 'text', 'english') "
        "where doc_id < 50 order by doc_id"
    ).collect()
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, gopher_rules

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = (
        d.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            gopher_rules(F.col("text"), stopwords=ENGLISH_STOPWORDS)[
                "passes"
            ].alias("passes"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_dsir_scores_fn(eng, spark):
    with pytest.raises(LoweringError, match="dsirScores takes"):
        eng.sql("select * from dsirScores('documents', 'doc_id', 'text')")
    got = eng.sql(
        "select doc_id, score from "
        "dsirScores('documents', 'doc_id', 'text', 'lang', 'en') "
        "where doc_id < 30 order by doc_id"
    ).collect()
    from nutdb_spark.operators.sampling import dsir_scores

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = (
        dsir_scores(d, "doc_id", "text", F.col("lang") == "en")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "score")
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bpe_train_fn(eng):
    with pytest.raises(LoweringError, match="bpeTrain takes"):
        eng.sql("select * from bpeTrain('documents', 'text')")
    with pytest.raises(LoweringError, match="n_merges must be >= 1"):
        eng.sql("select * from bpeTrain('documents', 'text', 0)")
    got = eng.sql(
        "select rk, a, b from bpeTrain('documents', 'text', 3) order by rk"
    ).collect()
    assert len(got) == 3
    # rank order and non-empty pair halves; values are corpus-trained
    assert [r["rk"] for r in got] == [1, 2, 3]
    assert all(r["a"] and r["b"] for r in got)


def test_dedup_substrings_fn(eng, spark):
    with pytest.raises(LoweringError, match="dedupSubstrings takes"):
        eng.sql("select * from dedupSubstrings('documents', 'doc_id')")
    with pytest.raises(LoweringError, match="k must be >= 2"):
        eng.sql(
            "select * from dedupSubstrings('documents', 'doc_id', 'text', 1)"
        )
    got = eng.sql(
        "select doc_id, n_removed from "
        "dedupSubstrings('documents', 'doc_id', 'text', 8) "
        "where doc_id < 30 order by doc_id"
    ).collect()
    from nutdb_spark.operators.dedup import dedup_repeated_ngrams

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = (
        dedup_repeated_ngrams(d, "doc_id", "text", k=8, max_freq=1)
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "n_removed")
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sentiment_fn(eng, spark):
    with pytest.raises(LoweringError, match="sentiment takes"):
        eng.sql("select * from sentiment('documents', 'doc_id')")
    got = eng.sql(
        "select doc_id, sentiment from "
        "sentiment('documents', 'doc_id', 'text') "
        "where doc_id < 20 order by doc_id"
    ).collect()
    from nutdb_spark.operators.text import sentiment_scores

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = (
        d.filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            sentiment_scores(F.col("text"))["sentiment"].alias("sentiment"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_epoch_shuffle_fn(eng):
    with pytest.raises(LoweringError, match="epochShuffle takes"):
        eng.sql("select * from epochShuffle('documents', 'doc_id', 1)")
    with pytest.raises(LoweringError, match="shards must be >= 1"):
        eng.sql(
            "select * from epochShuffle('documents', 'doc_id', 1, 0)"
        )
    rows = eng.sql(
        "select doc_id, eshard, pos from "
        "epochShuffle('documents', 'doc_id', 1, 4) order by eshard, pos"
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r["eshard"], []).append(r["pos"])
    for ps in per.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
