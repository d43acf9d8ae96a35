"""[EXT] Embedding-similarity operators (ANN / near-dup by cosine).

Vector math uses the scaled-integer convention: each float component is
floored at 1e7 scale to a bigint, so dot products and squared norms are
EXACT integer arithmetic — bit-identical across engines, partitionings,
and re-runs (the floating-point reduction-order problem that breaks
naive distributed cosine comparisons disappears). The final cosine is a
deterministic IEEE double computed from those exact integers.
Headroom: |x| < 92 per component for 64-dim vectors (fixture range ±1).

Candidate generation never does an all-pairs crossJoin:
- `cosine_pairs_blocked` blocks on an equi-key (e.g. a label/cluster),
- `lsh_bucket_pairs` buckets by deterministic sign-LSH hyperplanes,
- `topk_bruteforce` broadcasts a *small query set* against the corpus —
  the standard exact baseline, linear in corpus size, and the IVF-style
  `topk_lsh` probes only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10_000_000  # 1e7: exact to ~7 decimal digits per component

# Deterministic integer hyperplanes for sign-LSH, reproducible in any
# engine: h[p][i] = ((i+1)*(p+3) % 17) - 8  (fixed small integers).
_LSH_PLANES = 6
_LSH_DIM = 64


def _plane(p: int, i: int) -> int:
    return ((i + 1) * (p + 3)) % 17 - 8


def scaled(v: Column) -> Column:
    """array<float> → array<bigint> at 1e7 scale (exact thereafter)."""
    return F.transform(v, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def dot_scaled(a: Column, b: Column) -> Column:
    """Exact integer dot product of two scaled vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def norm_sq_scaled(a: Column) -> Column:
    return dot_scaled(a, a)


def cosine_from_scaled(dot: Column, na: Column, nb: Column) -> Column:
    """Deterministic double cosine from exact integer dot/norms²."""
    return dot.cast("double") / F.sqrt(na.cast("double")) / F.sqrt(nb.cast("double"))


def oracle_scaled(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )


def oracle_dot_scaled(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


def oracle_cosine(dot: str, na: str, nb: str) -> str:
    return f"CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE)) / sqrt(CAST({nb} AS DOUBLE))"


def lsh_bucket(v_scaled: Column, planes: int = _LSH_PLANES, dim: int = _LSH_DIM) -> Column:
    """Sign-LSH bucket id: bit p = [dot(v, plane_p) >= 0]. Hyperplanes
    are fixed small integers so any engine computes identical buckets."""
    out = F.lit(0).cast("long")
    for p in range(planes):
        d = F.aggregate(
            F.zip_with(
                v_scaled,
                F.array(*[F.lit(_plane(p, i)).cast("long") for i in range(dim)]),
                lambda x, w: x * w,
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        out = out + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def oracle_lsh_bucket(v_scaled: str, planes: int = _LSH_PLANES, dim: int = _LSH_DIM) -> str:
    terms = []
    for p in range(planes):
        ws = ", ".join(str(_plane(p, i)) for i in range(dim))
        d = (
            f"CAST(list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> {v_scaled}[i] * ([{ws}])[i])) AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _with_vec(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    s = scaled(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("__id"),
        s.alias("__v"),
    ).withColumn("__n2", norm_sq_scaled(F.col("__v")))


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """embedCosineSim near-dup pairs within a blocking key (label,
    cluster id, LSH bucket…): equi-join on the block, exact cosine,
    threshold filter. Output (id_a, id_b, cosine), id_a < id_b."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(block_col).alias("__blk"),
        scaled(F.col(vec_col)).alias("__v"),
    ).withColumn("__n2", norm_sq_scaled(F.col("__v")))
    a, b = base.alias("a"), base.alias("b")
    cos = cosine_from_scaled(
        dot_scaled(F.col("a.__v"), F.col("b.__v")),
        F.col("a.__n2"),
        F.col("b.__n2"),
    )
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_bucket_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs at corpus scale: candidates share a sign-LSH
    bucket (equi-join), then exact cosine verification."""
    base = _with_vec(df, id_col, vec_col).withColumn(
        "__blk", lsh_bucket(F.col("__v"))
    )
    a, b = base.alias("a"), base.alias("b")
    cos = cosine_from_scaled(
        dot_scaled(F.col("a.__v"), F.col("b.__v")),
        F.col("a.__n2"),
        F.col("b.__n2"),
    )
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """topKSimilar exact baseline: broadcast the (small) query set over
    the corpus, rank per query by (cosine desc, id asc). Output
    (query_id, neighbor_id, rank). Self-matches excluded."""
    c = _with_vec(corpus, id_col, vec_col)
    q = _with_vec(queries, id_col, vec_col).select(
        F.col("__id").alias("__qid"),
        F.col("__v").alias("__qv"),
        F.col("__n2").alias("__qn2"),
    )
    cos = cosine_from_scaled(
        dot_scaled(F.col("__qv"), F.col("__v")), F.col("__qn2"), F.col("__n2")
    )
    scored = (
        c.join(F.broadcast(q), F.col("__qid") != F.col("__id"))
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
