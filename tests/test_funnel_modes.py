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
            [WIN, "strict_sideways"], F.col("t"), F.lit(True)
        )


def test_strict_increase_tied_timestamps(spark):
    rows = [
        # g1: A/B share t=10 (struct tie-order processes B first, so
        # neither mode chains there); B at 20 extends -> 2; C shares
        # t=20 with B but sorts before it -> stays 2 in both modes
        (1, 10, 1), (1, 10, 2), (1, 20, 2), (1, 20, 3),
        # g2: strictly increasing A B C -> 3
        (2, 10, 1), (2, 11, 2), (2, 12, 3),
    ]
    got = _funnel(spark, rows, "strict_increase")
    assert got == {1: 2, 2: 3}


def test_strict_increase_blocks_same_ts_chain(spark):
    """The distinguishing case: an A-event at t=10 processed first
    (struct tie order), then an A+B event at the SAME t=10 — base
    mode chains step 2 onto the earlier event's state within the
    tie; strict_increase requires t(step2) > t(step1) and blocks."""
    from nutdb_spark.functions.registry import PARAMETRIC_AGGS as PA

    df = spark.createDataFrame(
        [(1, 10, True, False), (1, 10, True, True)],
        "g int, t long, a boolean, b boolean",
    )

    def run(params):
        return (
            df.groupBy("g")
            .agg(
                PA["windowFunnel"](
                    params, F.col("t"), F.col("a"), F.col("b")
                ).alias("d")
            )
            .first()["d"]
        )

    assert run([WIN]) == 2                        # base chains in-tie
    assert run([WIN, "strict_increase"]) == 1     # increase blocks
