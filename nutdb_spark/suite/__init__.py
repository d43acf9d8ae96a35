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
# Round-8 window (VERDICT r7 "Next round" #1): drain the never-graded
# backlog to ZERO — (1) all 25 ROUND-8 QUEUE entries (the last
# registry entries without any driver row), (2) every entry NEW this
# round (each new registration displaced one stale re-grade, so no
# new backlog forms), (3) the remainder filled with the STALEST
# re-grades (last driver row r4; q_fn_random stays out — rows-only by
# design, re-grading it adds no hash signal). After this window every
# registry entry has a driver row. Stale r4 entries displaced by (2)
# (q_text_normalize/ngrams/langid, q_stream_dedup/summing,
# q_pipeline_clean, q_sim_lsh_pairs, q_multimodal_resize) → the
# ROUND-9 re-grade pool, all already r4-green.
_PRIORITY = [
    # --- (1) the ROUND-8 QUEUE: never driver-graded (25) ---
    "sql_qualify", "sql_prewhere", "sql_sample", "sql_outfile",
    "sql_window_named", "sql_cte_chain", "sql_recursive_graph",
    "sql_setops_all", "sql_totals", "sql_array_join", "sql_lambda",
    "q_analytic_running", "q_analytic_topn", "q_analytic_rollup",
    "q_analytic_distribution", "q_analytic_timerange",
    "q_dedup_connected_best", "q_embed_quantize", "q_embed_truncate",
    "q_sample_temperature", "q_text_chunk", "q_fn_arrays",
    "q_fn_datetime2", "q_fn_scalar_surface2", "q_fn_agg_surface2",
    # --- (2) new in round 8 (25) ---
    "sql_table_fn_decon", "sql_table_fn_decon_drop", "sql_topk_rollup",
    "sql_dictget_broadcast", "sql_group_order_all", "sql_apply_modifier",
    "sql_any_join", "sql_grouping_fn", "sql_asof_using", "sql_uniq_upto",
    "sql_agg_if", "sql_agg_misc", "sql_seq_count", "sql_dicthas",
    "sql_fn_tier4", "sql_group_array_sorted", "sql_quantile_exact",
    "sql_fn_url", "sql_agg_combinators", "sql_agg_stats2",
    "sql_window_fns2", "sql_fn_tier5", "q_sim_topk_pq_adc",
    "q_dedup_pq_blocked", "q_stream_join_full",
    # (registered after the window filled — sql_agg_state_merge,
    # sql_fn_tier6, q_ddl_optimize_dedup, q_ddl_exchange, and
    # sql_alias_anywhere, q_sim_topk_ivf_adc, q_pipeline_index,
    # sql_table_fn_series, q_ddl_view_plain, sql_asof_forward,
    # sql_any_join_on, and sql_topk_if head the ROUND-9
    # queue with the displaced re-grades below)
    # --- (3) stalest re-grades (0 this session — the eight
    # displaced by the session-6 registrations — q_ddl_optimize,
    # q_dedup_exact_content, q_dedup_simhash, q_expr_between,
    # q_expr_index, q_expr_isnull, q_expr_interval,
    # q_ddl_complex_types — join the ROUND-9 re-grade pool beside
    # q_expr_like, q_fn_count_unique, q_fn_strings, q_fn_substring,
    # q_join_broadcast, q_join_salted, q_multimodal_frames, all
    # already r4-green) ---
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
