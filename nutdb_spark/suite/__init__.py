"""The engine's named query suite — the driver contract surface.

Every operator row in SURVEY.md §2 registers a named query here (via
``nutdb_spark.suite.registry.query``) together with an ANSI-SQL oracle
string DuckDB can run on the same parquet fixtures. ``__spark_entry__``
re-exports these dicts.
"""

from __future__ import annotations

import importlib

from nutdb_spark.suite.registry import ORACLE, QUERIES

# Import for side effect: each module registers its queries.
_MODULES = (
    "nutdb_spark.suite.tpch",
    "nutdb_spark.suite.query_core",
    "nutdb_spark.suite.joins",
    "nutdb_spark.suite.expressions",
    "nutdb_spark.suite.functions_suite",
    "nutdb_spark.suite.dedup",
    "nutdb_spark.suite.similarity",
    "nutdb_spark.suite.text",
    "nutdb_spark.suite.streaming_suite",
    "nutdb_spark.suite.multimodal_suite",
    "nutdb_spark.suite.analytics_suite",
    "nutdb_spark.suite.sql_suite",
    "nutdb_spark.suite.ddl_suite",
    "nutdb_spark.suite.pipeline",
)

for _m in _MODULES:
    try:
        importlib.import_module(_m)
    except ModuleNotFoundError as ex:
        # Only tolerate the suite module itself being absent; a missing
        # transitive import inside an existing module is a real bug and
        # must not silently shrink the graded suite.
        if ex.name != _m:
            raise

# The driver grades the first 50 registry entries.
# Round-10 window: every entry has a driver row (the r9 window drained
# the never-graded list to zero), so this window is (1) entries NEW
# this round — each displaces one section-3 filler by name so the list
# stays exactly 50 — then the STALEST re-grades: (2) the 20 remaining
# r4-graded entries (q_fn_random stays out — rows-only by design,
# re-grading it adds no hash signal; sql_limit_ties and sql_expressions
# also exercise this round's LIMIT…WITH TIES and arrayFill advice
# fixes), (3) the stalest r5-graded entries in ledger order — 13
# after the 17 new-entry displacements. The ROUND-11 re-grade pool is
# the 35 remaining r5-graded entries: the 18 never in this window
# (q_sim_topk_lsh, q_split_train_eval, q_stream_enrich,
# q_text_fingerprint, q_text_quality, q_union_distinct,
# q_window_session, q_window_tumbling, sql_asof, sql_q1, sql_setops,
# sql_table_fn, tpch_q10, tpch_q16, tpch_q20, tpch_q22, tpch_q8,
# tpch_q9) plus the 17 displaced by this round's new entries
# (q_sim_topk_ivf, q_sim_topk, q_sim_cosine_blocked, q_sample_hash,
# q_not_in_subquery, q_not_in_list_null, q_not_exists,
# q_multimodal_features, q_join_theta, q_join_right_semi,
# q_join_right_anti, q_join_left_anti, q_join_left,
# q_fn_scalar_surface, q_fn_conditional_agg, q_expr_concat,
# q_distinct); then the r6 pool.
_PRIORITY = [
    # --- (1) new in round 10 (displacements named per entry:
    # sql_fn_tier9 displaced q_sim_topk_ivf, sql_topk_weighted
    # displaced q_sim_topk, q_dedup_cdc_chunks displaced
    # q_sim_cosine_blocked, q_text_tfidf displaced q_sample_hash,
    # sql_window_range_date displaced q_not_in_subquery,
    # q_bucketed_join displaced q_not_in_list_null,
    # sql_fn_maps displaced q_not_exists,
    # q_stream_session_state displaced q_multimodal_features,
    # sql_agg_moving displaced q_join_theta, q_analytic_lttb
    # displaced q_join_right_semi, sql_fn_auc displaced
    # q_join_right_anti, sql_seq_next displaced q_join_left_anti,
    # sql_quantile_weighted displaced q_join_left,
    # q_dedup_cdc_incremental displaced q_fn_scalar_surface,
    # sql_fn_morton displaced q_fn_conditional_agg,
    # q_partition_pruning displaced q_expr_concat,
    # sql_fn_tier10 displaced q_distinct) ---
    "sql_fn_tier9", "sql_topk_weighted", "q_dedup_cdc_chunks",
    "q_text_tfidf", "sql_window_range_date", "q_bucketed_join",
    "sql_fn_maps", "q_stream_session_state", "sql_agg_moving",
    "q_analytic_lttb", "sql_fn_auc", "sql_seq_next",
    "sql_quantile_weighted", "q_dedup_cdc_incremental",
    "sql_fn_morton", "q_partition_pruning", "sql_fn_tier10",
    # --- (2) r4 re-grades (20) ---
    "q_text_tokenize", "q_window_sliding", "sql_cte_scalar",
    "sql_describe", "sql_distinct_on", "sql_embed_cosine",
    "sql_expressions", "sql_join_group", "sql_limit_ties",
    "sql_multi_join", "sql_not_in", "sql_q4_exists",
    "sql_source_files", "sql_text_pipeline",
    "tpch_q7", "tpch_q11", "tpch_q13", "tpch_q15", "tpch_q17",
    "tpch_q19",
    # --- (3) r5 re-grades (13 after displacements) ---
    "q_asof_join", "q_cluster_kmeans", "q_ddl_alter",
    "q_ddl_insert_select", "q_ddl_roundtrip", "q_ddl_view_replacing",
    "q_ddl_view_summing", "q_ddl_view_summing_incremental",
    "q_dedup_connected", "q_dedup_embedding", "q_dedup_exact",
    "q_dedup_jaccard", "q_dedup_minhash_sig",
]


def _reorder() -> None:
    front = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    for mapping in (QUERIES, ORACLE):
        ordered = {n: mapping[n] for n in front + rest if n in mapping}
        mapping.clear()
        mapping.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
