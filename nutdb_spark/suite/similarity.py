"""[EXT] Embedding-similarity suite over the `embeddings` fixture.

Exact scaled-integer vector math (operators.similarity) makes every
cosine bit-identical across engines, so even rank-based top-k results
hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.similarity import (
    cosine_pairs_blocked,
    lsh_bucket_pairs,
    oracle_cosine,
    oracle_dot_scaled,
    oracle_lsh_bucket,
    oracle_scaled,
    topk_bruteforce,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_SCALED_CTE = f"""
WITH v AS (
  SELECT vec_id, label, {oracle_scaled('embedding')} AS s FROM embeddings),
n AS (
  SELECT vec_id, label, s,
         {oracle_dot_scaled('s', 's')} AS n2
  FROM v)
"""

_COS = oracle_cosine(oracle_dot_scaled("a.s", "b.s"), "a.n2", "b.n2")


@query(
    "q_sim_cosine_blocked",
    _SCALED_CTE
    + f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS} >= 0.35
""",
)
def q_sim_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedCosineSim pairs blocked on the label column (equi-join
    candidate generation), exact cosine ≥ 0.35."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(
        e, "vec_id", "embedding", "label", threshold=0.35
    )


@query(
    "q_sim_lsh_pairs",
    _SCALED_CTE
    + f""",
b AS (SELECT vec_id, s, n2, {oracle_lsh_bucket('s')} AS blk FROM n)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
FROM b a JOIN b b ON a.blk = b.blk AND a.vec_id < b.vec_id
WHERE {_COS} >= 0.38
""",
)
def q_sim_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed near-dup pairs (deterministic integer
    hyperplanes → identical buckets in any engine), cosine ≥ 0.38."""
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_pairs(e, "vec_id", "embedding", threshold=0.38)


@query(
    "q_sim_topk",
    _SCALED_CTE
    + f"""
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {oracle_cosine(oracle_dot_scaled('q.s', 'c.s'), 'q.n2', 'c.n2')} DESC,
                    c.vec_id) AS rank
  FROM n q JOIN n c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10) t
WHERE rank <= 5
""",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topKSimilar exact baseline: 10 query vectors broadcast over the
    corpus, top-5 by (cosine desc, id) — linear in corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    return topk_bruteforce(e, queries, "vec_id", "embedding", k=5)


@query(
    "q_sim_topk_lsh",
    _SCALED_CTE
    + f""",
b AS (SELECT vec_id, s, n2, {oracle_lsh_bucket('s')} AS blk FROM n)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {oracle_cosine(oracle_dot_scaled('q.s', 'c.s'), 'q.n2', 'c.n2')} DESC,
                    c.vec_id) AS rank
  FROM b q JOIN b c ON q.blk = c.blk AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10) t
WHERE rank <= 5
""",
)
def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN scale path: probe only the query's LSH bucket
    (cogroup on bucket id), exact-rank the candidates — constant
    candidate set per query instead of the full corpus. Bucket ids come
    from the vectorized one-GEMM-per-batch path (`assign_lsh_buckets`)
    and scoring is the same per-bucket int64 GEMM + block-local top-k
    body as `topk_bruteforce` — no interpreted per-pair dots anywhere."""
    from pyspark.sql import Window

    from nutdb_spark.operators.similarity import (
        _topk_gemm_merge,
        assign_lsh_buckets,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = assign_lsh_buckets(e, "vec_id", "embedding")
    q = base.filter(F.col("__id") < 10).select(
        F.col("__id").alias("__qid"),
        F.col("__v").alias("__qv"),
        "__blk",
    )
    scored = (
        base.groupby("__blk")
        .cogroup(q.groupby("__blk"))
        .applyInPandas(
            _topk_gemm_merge(5),
            "query_id long, neighbor_id long, cosine double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )
