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


# --- IVF path: deterministic integer k-means clustering -------------------


def _oracle_kmeans(iters: int = 2, k: int = 8) -> str:
    """DuckDB twin of operators.similarity.kmeans_assign: same scaled
    ints, same floored-mean centroid update, same (d2, cid) tie-break.
    Parallel unnests zip a vector with its 1-based index, so the
    per-dimension sums are plain GROUP BYs."""
    d2 = (
        "CAST(list_sum(list_transform(range(1, 65), "
        "i -> (v.s[i] - c.s[i]) * (v.s[i] - c.s[i]))) AS BIGINT)"
    )
    parts = [
        f"v AS (SELECT vec_id, {oracle_scaled('embedding')} AS s FROM embeddings)",
        f"""c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, s
               FROM v ORDER BY vec_id LIMIT {k})""",
    ]
    cur = "c0"
    for r in range(1, iters + 1):
        parts += [
            f"""d{r} AS (SELECT v.vec_id, v.s, c.cid, {d2} AS d2
                   FROM v, {cur} c)""",
            f"""a{r} AS (SELECT vec_id, s, cid FROM (
                     SELECT vec_id, s, cid,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY d2, cid) AS rn
                     FROM d{r}) t WHERE rn = 1)""",
            f"""e{r} AS (SELECT cid, unnest(s) AS x,
                            unnest(range(1, 65)) AS i FROM a{r})""",
            f"""m{r} AS (SELECT cid,
                            list(CAST(FLOOR(CAST(sx AS DOUBLE) / n) AS BIGINT)
                                 ORDER BY i) AS s
                     FROM (SELECT cid, i, SUM(x) AS sx,
                                  COUNT(*) AS n
                           FROM e{r} GROUP BY cid, i) t GROUP BY cid)""",
            f"""c{r} AS (SELECT cid, s FROM m{r}
                     UNION ALL
                     SELECT cid, s FROM {cur}
                     WHERE cid NOT IN (SELECT cid FROM m{r}))""",
        ]
        cur = f"c{r}"
    parts.append(
        f"""fin AS (SELECT vec_id, cid, d2 FROM (
                 SELECT v.vec_id, c.cid, {d2} AS d2,
                        row_number() OVER (PARTITION BY v.vec_id
                                           ORDER BY {d2}, c.cid) AS rn
                 FROM v, {cur} c) t WHERE rn = 1)"""
    )
    return "WITH " + ",\n".join(parts)


@query(
    "q_cluster_kmeans",
    _oracle_kmeans() + "\nSELECT vec_id, cid, d2 AS dist2 FROM fin",
)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer k-means (2 Lloyd iterations, floored-mean
    centroids, exact int64 distances): the learned-centroid IVF
    blocking for ANN. Every assignment is bit-identical to the DuckDB
    oracle because no float reduction order exists anywhere — scaled
    ints in, integer centroid updates, exact distance² comparisons."""
    from nutdb_spark.operators.similarity import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, "vec_id", "embedding", k=8, iters=2).select(
        F.col("__id").alias("vec_id"), "cid", "dist2"
    )


@query(
    "q_sim_topk_ivf",
    _oracle_kmeans()
    + f""",
b AS (SELECT f.vec_id, f.cid, v.s,
             {oracle_dot_scaled('v.s', 'v.s')} AS n2
      FROM fin f JOIN v ON f.vec_id = v.vec_id)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {oracle_cosine(oracle_dot_scaled('q.s', 'c.s'), 'q.n2', 'c.n2')} DESC,
                    c.vec_id) AS rank
  FROM b q JOIN b c ON q.cid = c.cid AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10) t
WHERE rank <= 5
""",
)
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with LEARNED centroids: k-means clusters are the
    inverted-file buckets; each query probes only its own cluster and
    exact-ranks the members via the shared per-block GEMM body — the
    classic IVF-flat search, completing the ANN family (brute-force →
    sign-LSH → learned IVF)."""
    from pyspark.sql import Window

    from nutdb_spark.operators.similarity import (
        _topk_gemm_merge,
        kmeans_assign,
        scaled,
    )

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, "vec_id", "embedding", k=8, iters=2)
    base = assign.select(F.col("__id"), F.col("cid").alias("__blk")).join(
        e.select(
            F.col("vec_id").alias("__id"),
            scaled(F.col("embedding")).alias("__v"),
        ),
        "__id",
    )
    q = base.filter(F.col("__id") < 10).select(
        F.col("__id").alias("__qid"),
        F.col("__v").alias("__qv"),
        F.col("__blk").alias("__qblk"),
    )
    scored = (
        base.groupby("__blk")
        .cogroup(q.groupby("__qblk"))
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
