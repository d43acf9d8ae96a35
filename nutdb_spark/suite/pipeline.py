"""[EXT] End-to-end training-data cleaning pipeline over `documents`.

The composition a real LLM-data pipeline runs as one job: quality
filter → exact content dedup → near-dup removal → per-language corpus
stats. Every stage is an existing operator (text.quality /
dedup.dedup-family), so this entry pins that they COMPOSE — one
DataFrame plan end to end, verified against a DuckDB oracle that mirrors
each stage.

Scale shape: the quality filter is a pure projection+filter (pushed to
the scan where possible), exact dedup is one hash-groupBy + semi-join,
near-dup is the guarded inverted-index join, and the final stats are a
map-side-partial aggregate — no stage materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import (
    dedup_near_keep_first,
    jaccard_pairs,
    oracle_shingles,
)
from nutdb_spark.operators.text import (
    ENGLISH_STOPWORDS,
    fingerprint_md5,
    oracle_fingerprint_md5,
    oracle_stopword_ratio,
    stopword_ratio,
    tokenize,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_MIN_TOKENS = 20
_MIN_STOPWORD = 0.05
_NGRAM = 4
_JACCARD_THR = 0.6
_MAX_FREQ = 100

_W = "string_split_regex(trim(text), '\\s+')"


def _oracle() -> str:
    sw = oracle_stopword_ratio("w", ENGLISH_STOPWORDS)
    return f"""
WITH q AS (
  SELECT doc_id, lang, text, {_W} AS w FROM documents),
kept AS (
  SELECT * FROM q
  WHERE len(w) >= {_MIN_TOKENS} AND {sw} >= {_MIN_STOPWORD}),
reps AS (
  SELECT MIN(doc_id) AS doc_id FROM kept
  GROUP BY {oracle_fingerprint_md5('text')}),
surv AS (SELECT k.* FROM kept k JOIN reps USING (doc_id)),
toks AS (
  SELECT doc_id, {oracle_shingles('text', _NGRAM)} AS sh FROM surv),
sizes AS (SELECT doc_id, len(sh) AS n FROM toks),
ex0 AS (SELECT doc_id, unnest(sh) AS s FROM toks),
keep AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= {_MAX_FREQ}),
ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN keep USING (s)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
neardup AS (
  SELECT DISTINCT p.id_b FROM pairs p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
  WHERE p.shared * 1.0 / (sa.n + sb.n - p.shared) >= {_JACCARD_THR}),
clean AS (
  SELECT s.* FROM surv s LEFT JOIN neardup d ON s.doc_id = d.id_b
  WHERE d.id_b IS NULL)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(w)) AS BIGINT) AS total_tokens
FROM clean GROUP BY lang
"""


@query("q_pipeline_clean", _oracle())
def q_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup → near-dup-drop → per-lang stats,
    as one composed DataFrame plan."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    kept = d.filter(
        (F.size(toks) >= _MIN_TOKENS)
        & (stopword_ratio(toks, ENGLISH_STOPWORDS) >= _MIN_STOPWORD)
    )
    reps = (
        kept.groupBy(fingerprint_md5(F.col("text")).alias("__k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = kept.join(reps, "doc_id", "left_semi")
    pairs = jaccard_pairs(
        surv, "doc_id", "text",
        n=_NGRAM, threshold=_JACCARD_THR, max_shingle_freq=_MAX_FREQ,
    )
    clean = dedup_near_keep_first(pairs, surv, "doc_id")
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text"))).cast("long")).alias(
            "total_tokens"
        ),
    )
