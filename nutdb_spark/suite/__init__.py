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

# The driver grades the first 50 registry entries. Round-6 window
# (VERDICT r5 "Next round" #3: rotate onto the 36 stalest so no
# entry's latest driver row is older than two rounds):
# (1) ALL 12 entries NEW this round (never graded — a never-graded
# entry can't be claimed driver-green at all, so these outrank
# re-grades of locally-green code-touched entries), (2) all 9 entries
# whose latest driver row is r2, (3) all 27 whose latest row is r3,
# (4) the two entries whose ORACLE/guard semantics changed this round
# and aren't transitively covered: q_dedup_minhash_lsh (max_bucket cap
# applied on both sides) and q_fn_datetime (toDayOfWeek now ISO).
# Other code-touched paths are window-covered transitively:
# q_sim_topk_ivf/q_cluster_kmeans by q_sim_topk_ivf_mp + q_sim_recall
# (same centroid artifact, same probe body), sql_asof by
# sql_asof_within, q_dedup_connected by q_dedup_connected_star (same
# closure oracle), catalog view-repair hooks by 4 lifecycle pytests.
# Entries not listed keep module registration order after the window.
# Entries added AFTER this round's window was frozen (sequence
# packing, JSON fns, window analytics, rollup, PII scrub) queue for
# the round-7 window.
#
# ROUND-7 QUEUE (never driver-graded; admit these first): the 27
# session-4 entries — q_pack_manifest, sql_select_modifiers,
# sql_columns_regex, sql_parametric, q_ddl_ctas, sql_with_scalar,
# sql_arrayjoin_fn, q_sample_curriculum, q_analytic_global_rank,
# sql_retention, sql_funnel, sql_any_all, sql_q17_corr, sql_in_corr,
# sql_range_frame, sql_with_fill_interp, sql_sequence_match,
# q_stream_funnel, q_ddl_view_aggregating, sql_cast, sql_ansi_basics,
# sql_values_inline, sql_q21_corr, sql_q22_corr, sql_dictget,
# sql_table_fn_dedup, sql_table_fn_ann, sql_fn_tier3, sql_fn_math3,
# sql_table_fn_split, sql_pipeline_e2e, sql_cube, sql_config_vars —
# plus the earlier-r6 late additions already noted below.
_PRIORITY = [
    # --- new in round 6 (never graded) (12) ---
    "sql_asof_within", "q_sim_topk_ivf_mp", "q_sim_recall",
    "q_dedup_connected_star", "q_text_termstats", "q_stream_join",
    "q_sample_stratified", "q_sample_domain_cap", "q_text_repetition",
    "q_text_decontaminate", "q_dedup_spans", "q_multimodal_audio",
    # --- stalest: last driver row is r2 (9) ---
    "q_expr_compare", "q_expr_logic", "q_in_subquery", "q_join_right",
    "q_not_in_list", "q_select_star", "tpch_q14", "tpch_q5", "tpch_q6",
    # --- last driver row is r3 (27) ---
    "q_cte", "q_distinct_on", "q_except", "q_exists", "q_expr_arith",
    "q_expr_bitwise", "q_expr_case", "q_fn_dates", "q_fn_minmax",
    "q_fn_quantile", "q_fn_quantile_approx", "q_having", "q_in_list",
    "q_intersect", "q_join_full", "q_join_inner", "q_join_left_semi",
    "q_join_using", "q_limit_offset", "q_limit_with_ties",
    "q_not_in_subquery_null", "q_qualified_star", "q_scalar_subquery",
    "q_union_all", "tpch_q12", "tpch_q18", "tpch_q21",
    # --- semantics-changed this round, not transitively covered (2) ---
    "q_dedup_minhash_lsh", "q_fn_datetime",
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
