"""Pins for arrayAUC (midrank ties, degenerate classes, the classic
0.75 example) and sequenceNextNode (chain at end of series, no match,
unsupported direction/base rejection).
"""

from __future__ import annotations

import pytest

from nutdb_spark.engine import NutEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir)


def test_array_auc_semantics(eng):
    r = eng.sql(
        "select arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) as a, "
        "arrayAUC([0.5, 0.5], [0, 1]) as tie, "
        "arrayAUC([0.1, 0.2], [1, 1]) as onlypos, "
        "arrayAUC([0.9, 0.1], [1, 0]) as perfect, "
        "arrayROCAUC([0.9, 0.1], [0, 1]) as inverted"
    ).first()
    assert r["a"] == 0.75
    assert r["tie"] == 0.5  # tied scores take midranks
    assert r["onlypos"] is None  # single-class: undefined
    assert r["perfect"] == 1.0
    assert r["inverted"] == 0.0


def test_sequence_next_node_edges(eng):
    rows = eng.sql(
        "select g, sequenceNextNode('forward', 'head')(t, v, "
        "  v = 'a', v = 'b') as nxt "
        "from (values (1, 1, 'a'), (1, 2, 'b'), (1, 3, 'c'), "
        "      (2, 1, 'a'), (2, 2, 'b'), "
        "      (3, 1, 'c'), (3, 2, 'a'), (3, 3, 'c')) "
        "  as s(g, t, v) "
        "group by g order by g"
    ).collect()
    got = {r["g"]: r["nxt"] for r in rows}
    assert got[1] == "c"  # a,b matched → next is c
    assert got[2] is None  # chain ends the series: nothing follows
    assert got[3] is None  # no consecutive a,b run at all


def test_sequence_next_node_rejects_unsupported(eng):
    from nutdb_spark.functions.registry import PARAMETRIC_AGGS
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="forward, head"):
        PARAMETRIC_AGGS["sequenceNextNode"](
            ["backward", "tail"], F.col("t"), F.col("v"), F.lit(True)
        )
