"""windowFunnel strict-mode armor: hand-computed chains pin the
documented semantics (the oracled entry sql_funnel_strict pins the
DuckDB bit-identity of the same folds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import PARAMETRIC_AGGS as P

WIN = 1000


def _funnel(spark, rows, mode=None, n=3):
    """rows: (g, t, step) with step in 1..n or 0 = matches nothing."""
    df = spark.createDataFrame(rows, "g int, t long, s int")
    params = [WIN] if mode is None else [WIN, mode]
    conds = [F.col("s") == k for k in range(1, n + 1)]
    return {
        r["g"]: r["d"]
        for r in df.groupBy("g")
        .agg(P["windowFunnel"](params, F.col("t"), *conds).alias("d"))
        .collect()
    }


def test_strict_order_breaks_on_intervention(spark):
    rows = [
        # g1: A B D C -> D (step 0 = unrelated) intervenes, depth 2
        (1, 10, 1), (1, 20, 2), (1, 30, 0), (1, 40, 3),
        # g2: A B C uninterrupted -> 3
        (2, 10, 1), (2, 20, 2), (2, 30, 3),
        # g3: A C B -> C does not advance the A-chain, kills it; B
        # alone starts nothing -> depth 1
        (3, 10, 1), (3, 20, 3), (3, 30, 2),
    ]
    got = _funnel(spark, rows, "strict_order")
    assert got == {1: 2, 2: 3, 3: 1}
    # base mode tolerates the intervention
    assert _funnel(spark, rows)[1] == 3


def test_strict_order_out_of_order_event_breaks(spark):
    # A B then another A: the repeated A does not advance the A->B
    # chain -> chain dies, but the new A starts depth 1; C then
    # extends nothing beyond 2... B after the second A reaches 2.
    rows = [(1, 10, 1), (1, 20, 2), (1, 30, 1), (1, 40, 2), (1, 50, 3)]
    got = _funnel(spark, rows, "strict_order")
    assert got[1] == 3  # 30:A, 40:B, 50:C is consecutive


def test_strict_dedup_repeat_interrupts(spark):
    rows = [
        # g1: A B A C -> the second A repeats the chain's condition
        # 1 at depth 2 -> chain killed before C; second A starts a
        # fresh chain, C can't extend it (no B) -> depth 2
        (1, 10, 1), (1, 20, 2), (1, 30, 1), (1, 40, 3),
        # g2: A B C clean -> 3
        (2, 10, 1), (2, 20, 2), (2, 30, 3),
        # g3: A X B C (unrelated event ignored) -> 3
        (3, 10, 1), (3, 20, 0), (3, 30, 2), (3, 40, 3),
    ]
    got = _funnel(spark, rows, "strict_dedup")
    assert got == {1: 2, 2: 3, 3: 3}
    # base mode reaches 3 on g1 (A B . C with the repeat ignored)
    assert _funnel(spark, rows)[1] == 3


def test_strict_modes_window_still_applies(spark):
    rows = [(1, 10, 1), (1, 20, 2), (1, 10 + WIN + 100, 3)]
    # consecutive events but outside the window from the chain start
    assert _funnel(spark, rows, "strict_order")[1] == 2
    assert _funnel(spark, rows, "strict_dedup")[1] == 2


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="mode"):
        P["windowFunnel"](
            [WIN, "strict_increase"], F.col("t"), F.lit(True)
        )
