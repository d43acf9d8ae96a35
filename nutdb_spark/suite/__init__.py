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
# Round-9 window (VERDICT r8 "Next round" #1): finish the signal
# ledger — (1) the 12 entries registered after the r8 window filled
# (never driver-graded, all local-green), (2) entries NEW this round
# (each displaces one filler re-grade from section 3, by name, so the
# list stays exactly 50), (3) the remainder filled with the STALEST
# re-grades (last driver row r4; q_fn_random stays out — rows-only by
# design, re-grading it adds no hash signal). After this window the
# only entries without a driver row are this round's own late
# registrations, if any; the remaining r4-graded entries
# (sql_expressions, sql_distinct_on, sql_limit_ties, sql_cte_scalar,
# sql_not_in, sql_describe, sql_text_pipeline, sql_embed_cosine,
# sql_multi_join, sql_source_files) are the ROUND-10 re-grade pool.
_PRIORITY = [
    # --- (1) never driver-graded: registered after the r8 window
    # filled (12) ---
    "q_sim_topk_ivf_adc", "q_pipeline_index", "sql_agg_state_merge",
    "sql_fn_tier6", "sql_alias_anywhere", "sql_table_fn_series",
    "sql_asof_forward", "sql_any_join_on", "sql_topk_if",
    "q_ddl_optimize_dedup", "q_ddl_exchange", "q_ddl_view_plain",
    # --- (2) new in round 9 (each displaced a section-3 filler, by
    # name: q_dedup_incremental_exact displaced sql_join_group,
    # q_sim_ivf_append displaced sql_q4_exists, sql_fn_tier7 displaced
    # q_window_sliding, sql_median_exact displaced q_text_tokenize,
    # q_dedup_edit_verified displaced tpch_q19, sql_fn_tier8 displaced
    # tpch_q17, q_pipeline_incremental displaced tpch_q15,
    # q_stream_join_right displaced tpch_q13, q_dedup_recall displaced
    # tpch_q11, sql_agg_assoc displaced tpch_q7) ---
    "q_dedup_incremental", "q_dedup_incremental_exact",
    "q_sim_ivf_append", "sql_fn_tier7", "sql_median_exact",
    "q_dedup_edit_verified", "sql_fn_tier8", "q_pipeline_incremental",
    "q_stream_join_right", "q_dedup_recall", "sql_agg_assoc",
    # --- (3) stalest re-grades (last driver row r4; 37 to fill the
    # window to exactly 50). sql_params re-grades here per VERDICT r8
    # #6 (the $n-parameter entry needed a fresh driver row) ---
    "sql_params",
    "q_text_normalize", "q_text_ngrams", "q_text_langid",
    "q_stream_dedup", "q_stream_summing", "q_pipeline_clean",
    "q_sim_lsh_pairs", "q_multimodal_resize", "q_ddl_optimize",
    "q_dedup_exact_content", "q_dedup_simhash", "q_expr_between",
    "q_expr_index", "q_expr_isnull", "q_expr_interval", "q_expr_like",
    "q_ddl_complex_types", "q_fn_count_unique", "q_fn_strings",
    "q_fn_substring", "q_join_broadcast", "q_join_salted",
    "q_multimodal_frames",
    "tpch_q2_mincost", "tpch_q3", "tpch_q4",
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
