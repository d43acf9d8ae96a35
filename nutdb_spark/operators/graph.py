"""[EXT] Link-graph centrality — exact integer-scaled PageRank.

Web-scale training pipelines rank pages/domains by link-graph
centrality (the Common Crawl quality-signal family: a page linked
from many well-linked pages is likelier to be worth keeping), and
PageRank is the canonical such score. The reference engine has no
graph operators at all (its dedup story stops at pairs); this module
adds the centrality half next to the connected-components half in
``operators/dedup.py``.

Exactness discipline: floating-point PageRank cannot hash-oracle
(iterated float sums are order-sensitive), so ranks are held as
int64 in units of 1/SCALE and every step is integer arithmetic —
``r' = (15·(SCALE div N) + 85·Σ_in (r_u div outdeg_u)) div 100``,
i.e. damping 0.85 as an exact rational. Both engines replay the
identical div/sum/div sequence, so values are bit-equal. (The spec
IS the integer recurrence; it converges to within 1/SCALE of the
float fixpoint and, like the float version, total mass drifts only
through the documented floor losses.)

Scale design: one iteration = one equi-join of the rank vector
(N rows) against the edge list + one groupBy on dst — the standard
Pregel-free DataFrame PageRank. Iterations are a FIXED count (a
literal in the plan), so the whole computation is one lazy unrolled
plan: Catalyst sees K join/agg pairs over a rank frame that never
exceeds N rows, AQE picks broadcast for the rank side when it is
small, and at 100 TB the edge list partitions on src once and is
reused by every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12

# damping = DAMP_NUM / DAMP_DEN (0.85), applied in integer math
DAMP_NUM = 85
DAMP_DEN = 100
BASE_NUM = DAMP_DEN - DAMP_NUM  # 15


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iters: int = 8,
    scale: int = SCALE,
    n_nodes: int | None = None,
) -> DataFrame:
    """Exact integer PageRank.

    ``edges``: (src, dst) long columns — duplicates count as parallel
    links (they add contribution twice, matching the oracle).
    ``nodes``: one ``id`` column covering every vertex (dangling
    nodes — no out-edges — contribute nothing, the classic
    "sink loses mass to the floor" simplification; with the suite's
    synthesized graphs every node has outdeg ≥ 1).

    Returns (id, rank) with rank in units of 1/scale.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    # N is part of the spec constants (base share = scale div N); a
    # 1-row count action if the caller doesn't already know it.
    n = nodes.count() if n_nodes is None else n_nodes
    base = scale // n
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # The unrolled plan reuses the edge list and node set once per
    # iteration — persist both (lazy; materialized on first execution)
    # so 100 TB of edges is scanned/shuffled once, not `iters` times.
    # The GraphX discipline; at these sizes the cache is node/edge-
    # bounded, never iteration-bounded.
    e = edges.join(outdeg, "src").persist()
    nodes = nodes.select("id").persist()
    ranks = nodes.select("id", F.lit(base).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .select(
                F.col("dst"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["id"] == contrib["dst"], "left"
        ).select(
            "id",
            F.expr(
                f"({BASE_NUM} * cast({base} as bigint)"
                f" + {DAMP_NUM} * coalesce(s, cast(0 as bigint)))"
                f" div {DAMP_DEN}"
            ).alias("rank"),
        )
    return ranks


def oracle_pagerank_sql(
    edges_cte: str,
    nodes_cte: str,
    *,
    iters: int = 8,
    scale: int = SCALE,
    n_expr: str = "(SELECT COUNT(*) FROM __nodes)",
) -> str:
    """DuckDB replay: the identical integer recurrence, unrolled as
    ``iters`` chained CTEs (aggregates are not allowed in a recursive
    CTE's recursive term, so unrolling is the portable spelling).
    ``edges_cte``/``nodes_cte`` are full SELECTs producing
    (src, dst) / (id)."""
    parts = [
        f"__edges AS ({edges_cte})",
        f"__nodes AS ({nodes_cte})",
        f"__n AS (SELECT {scale} // {n_expr} AS base)",
        "__deg AS (SELECT src, COUNT(*) AS outdeg"
        " FROM __edges GROUP BY src)",
        "__e AS (SELECT e.src, e.dst, d.outdeg"
        " FROM __edges e JOIN __deg d USING (src))",
        "r0 AS (SELECT id, (SELECT base FROM __n) AS rank FROM __nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS id,"
            f" SUM(r.rank // e.outdeg) AS s"
            f" FROM __e e JOIN r{i} r ON e.src = r.id GROUP BY e.dst)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.id,"
            f" ({BASE_NUM} * (SELECT base FROM __n)"
            f" + {DAMP_NUM} * COALESCE(c.s, 0)) // {DAMP_DEN} AS rank"
            f" FROM __nodes n LEFT JOIN c{i} c USING (id))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(rank AS BIGINT) AS rank FROM r{iters}"
    )


__all__ = ["pagerank", "oracle_pagerank_sql", "SCALE"]
