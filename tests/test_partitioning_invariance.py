"""Distributed-determinism armor: representative suite entries must
produce IDENTICAL rows under different shuffle partitionings — the
property every docstring's "deterministic across repartitionings"
claim rests on, checked end-to-end at the entry level (fold-backed
aggregates, deterministic samples, blocking joins, window folds).

Float columns compare by exact repr — the suite's exact-arithmetic
discipline means partitioning must not move a single ulp.
"""

from __future__ import annotations

import math

SF01 = "/root/testdata/sf0.01"

ENTRIES = [
    "sql_agg_anova",            # sorted-group float fold
    "sql_agg_matrix",           # exact-sums matrix cells
    "sql_agg_quantile_interp",  # order statistics + interpolation
    "sql_funnel_strict",        # DP folds over collected events
    "sql_fn_tier14",            # md5-keyed sample, groupArrayLast
    "q_text_bigram_lm",         # corpus-count equi-join
    "q_dedup_fuzzy_join",       # blocking + argmax resolution
    "q_geo_bucket_join",        # grid-cell pair generation
    "q_split_kfold",            # hash-bucket assignment
    "q_analytic_period",        # autocorrelation argmax
    "sql_agg_resample",         # conditional-cell aggregate
    "q_pack_efficiency",        # window cumsum planner
    # round-12 session-3 wave
    "q_text_gopher",            # rule-gate projection
    "q_dedup_substring",        # corpus gram counts + span rebuild
    "q_sample_dsir",            # hashed ratios + histogram top-k cut
    "q_pack_shuffle",           # per-epoch salted rank
    "q_pipeline_curate",        # five-stage composition
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(df):
    return sorted(
        tuple(_norm(v) for v in r) for r in df.collect()
    )


def test_entries_invariant_under_partitioning(spark):
    from nutdb_spark.suite import QUERIES

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {}
    for name in ENTRIES:
        baseline[name] = _rows(QUERIES[name](spark, SF01))
        assert baseline[name], name  # non-empty guard
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        for name in ENTRIES:
            again = _rows(QUERIES[name](spark, SF01))
            assert again == baseline[name], name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
