"""Plan-shape pins for the round-11 session-2 entries: the scale
claims each docstring makes, checked against the executed plan.
"""

from __future__ import annotations

import re

SF01 = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_in_new_join_shaped_entries(spark):
    from nutdb_spark.suite import QUERIES

    for name in (
        "q_text_bigram_lm",     # bigram-count equi-join
        "q_dedup_fuzzy_join",   # trigram blocking equi-joins
        "q_geo_bucket_join",    # 3x3 grid-cell equi-join
        "q_join_bloom_filter",  # shuffle equi-join
    ):
        plan = plan_of(QUERIES[name](spark, SF01))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_single_aggregate_entries_have_one_exchange(spark):
    """The wide per-customer aggregate entries promise ONE hash
    aggregate pass: at most one shuffle Exchange beyond the ORDER BY
    range partitioning."""
    from nutdb_spark.suite import QUERIES

    for name in ("sql_agg_anova", "sql_agg_matrix", "sql_agg_resample"):
        plan = plan_of(QUERIES[name](spark, SF01))
        hash_exchanges = len(
            re.findall(r"Exchange hashpartitioning", plan)
        )
        assert hash_exchanges <= 1, (name, hash_exchanges)


def test_layout_compaction_single_window_shuffle(spark):
    from nutdb_spark.suite import QUERIES

    plan = plan_of(QUERIES["q_layout_compaction"](spark, SF01))
    # one shuffle on the partition key feeds both the cumsum window
    # and the rollup (same key)
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_readability_is_pure_projection(spark):
    from nutdb_spark.suite import QUERIES

    plan = plan_of(QUERIES["q_text_readability"](spark, SF01))
    assert "Exchange" not in plan  # no shuffle at all: scan + project
