"""[EXT] Trajectory / time-series similarity search.

The REPOSE problem class (ICDE 2021 — distributed top-k trajectory
similarity): find, for each query series, the corpus series with the
smallest alignment distance, at scale, by PRUNING candidates with a
cheap blocking key and VERIFYING survivors with the exact distance.
REPOSE blocks by trie-indexed local reference points; the engine
blocks by value-envelope buckets (the same prune-then-verify plan
shape on its fixtures' 1-D value series) and verifies with exact
integer DYNAMIC TIME WARPING — |Δ| point cost over scaled-int values,
so the whole search hash-oracles (a float DTW never would).

Scale shape: series assembly is one groupBy(user) with a bounded
sort (``max_len`` caps the per-series state, the per-group contract);
candidate generation is an EQUI-join on envelope buckets (each series
lands in its envelope-midpoint bucket and each query probes ±probes
neighbors — the q_join_interval bucketing precedent, never a
cartesian); verification is the O(m·n) DP fold per surviving pair,
row-local JVM arithmetic. At 100 TB you widen buckets / add
reference-point keys; the plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DTW_INF = 1 << 62


def user_value_series(
    df: DataFrame,
    user_col: str,
    order_col: str,
    value_col: str,
    *,
    scale: int = 100,
    max_len: int = 30,
) -> DataFrame:
    """(user, v) — each user's first ``max_len`` values in ``order_col``
    order, floor-scaled to exact int64 (the engine's dialect
    convention). Users with no rows don't appear; the sort state is
    max_len-bounded per group."""
    pts = df.select(
        F.col(user_col).alias("user"),
        F.struct(
            F.col(order_col).alias("o"),
            F.floor(F.col(value_col) * scale).cast("long").alias("v"),
        ).alias("p"),
    )
    return (
        pts.groupBy("user")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list("p")), lambda s: s["v"]
                ),
                1,
                max_len,
            ).alias("v")
        )
        .filter(F.size("v") > 0)
    )


def dtw_distance(a: Column, b: Column) -> Column:
    """Exact integer DTW(a, b): dp[i][j] = |a_i − b_j| +
    min(dp[i−1][j], dp[i][j−1], dp[i−1][j−1]), rolling one (n+1)-wide
    row through a fold over ``a`` (index 1 holds the j=0 boundary).
    Int64-safe: path length · max|Δ| stays far under the 2^62
    boundary sentinel. NULL when either side is empty."""
    inf = F.lit(DTW_INF).cast("long")
    n = F.size(b)
    row0 = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda j: inf),
    )
    final = F.aggregate(
        a,
        row0,
        lambda prev, x: F.aggregate(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            F.array(inf),
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.abs(x - F.element_at(b, j))
                    + F.least(
                        F.element_at(prev, j + 1),
                        F.element_at(prev, j),
                        F.element_at(acc, -1),
                    )
                ),
            ),
        ),
    )
    return F.when(
        (F.size(a) == 0) | (n == 0), F.lit(None).cast("long")
    ).otherwise(F.element_at(final, n + 1))


def dtw_topk(
    series: DataFrame,
    *,
    n_queries: int,
    k: int,
    bucket_width: int,
    probes: int = 1,
) -> DataFrame:
    """Top-``k`` most-DTW-similar corpus series per query series
    (queries = the first ``n_queries`` user ids): every series lands
    in its envelope-midpoint bucket ``(min+max) div 2 div width``;
    each query probes its own bucket ±``probes`` (equi-join on the
    bucket key — the blocking is the prune, DTW is the verify).
    Returns (query_id, neighbor_id, dtw, rank) with the deterministic
    (dtw ASC, neighbor ASC) order. A neighbor outside the probed
    band is pruned by design — the recall/cost knob every blocked
    similarity search in this engine exposes."""
    env = series.select(
        "user",
        "v",
        F.expr(
            f"((array_min(v) + array_max(v)) div 2) div {bucket_width}"
        ).alias("b"),
    )
    queries = env.filter(F.col("user") < n_queries).select(
        F.col("user").alias("qid"),
        F.col("v").alias("qv"),
        F.explode(
            F.sequence(F.col("b") - probes, F.col("b") + probes)
        ).alias("b"),
    )
    cand = queries.join(env, "b").filter(F.col("user") != F.col("qid"))
    scored = cand.select(
        "qid",
        F.col("user").alias("neighbor_id"),
        dtw_distance(F.col("qv"), F.col("v")).alias("dtw"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dtw").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "neighbor_id", "dtw", "rank")
    )


def oracle_dtw(a_expr: str, b_expr: str) -> str:
    """DuckDB replay of dtw_distance: the identical rolling-row DP —
    outer fold over the query values (single-value lists appended to
    the initial row so list_reduce's acc stays LIST(BIGINT)), inner
    fold over 1..n building the new row."""
    inner = (
        f"list_reduce([[{DTW_INF}]::BIGINT[]] || "
        f"list_transform(range(1, len({b_expr}) + 1), j -> [j]), "
        "(acc2, jl) -> acc2 || "
        f"[abs(xl[1] - {b_expr}[jl[1]]) + "
        "least(acc[jl[1] + 1], acc[jl[1]], acc2[-1])])"
    )
    row0 = (
        f"([0]::BIGINT[] || list_transform(range(1, len({b_expr}) + 1), "
        f"j -> {DTW_INF}::BIGINT))"
    )
    return (
        f"CASE WHEN len({a_expr}) = 0 OR len({b_expr}) = 0 THEN NULL ELSE "
        f"list_reduce([{row0}] || list_transform({a_expr}, x -> [x]), "
        f"(acc, xl) -> {inner})[len({b_expr}) + 1] END"
    )
