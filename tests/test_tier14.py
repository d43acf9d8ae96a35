"""Tier-14 armor: sequenceMatchEvents, groupArraySample,
groupArrayLast, arrayNormalize. The oracled entry (sql_fn_tier14)
pins DuckDB bit-identity; these pin values and the edge branches.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import (
    PARAMETRIC_AGGS as P,
    SCALAR_FNS as S,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "g int, t long, a boolean, b boolean")


def test_sequence_match_events_witness(spark):
    rows = [
        (1, 10, False, True),   # b before any a: not a witness
        (1, 20, True, False),   # a matches step 1 -> t=20
        (1, 30, True, True),    # b matches step 2 -> t=30
        (1, 40, False, True),
        (2, 10, True, False),   # a only: no match
        (3, 10, True, True),    # one event may NOT fill both steps
    ]
    got = {
        r["g"]: r["m"]
        for r in _events(spark, rows)
        .groupBy("g")
        .agg(
            P["sequenceMatchEvents"](
                ["(?1)(?2)"], F.col("t"), F.col("a"), F.col("b")
            ).alias("m")
        )
        .collect()
    }
    assert list(got[1]) == [20, 30]
    assert got[2] is None
    assert got[3] is None


def test_sequence_match_events_rejects_time_constraints(spark):
    with pytest.raises(ValueError, match="witness"):
        P["sequenceMatchEvents"](
            ["(?1)(?t<=5)(?2)"], F.col("t"), F.col("a"), F.col("b")
        )


def test_group_array_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(1, f"v{i}") for i in range(50)], "g int, x string"
    )
    a = (
        df.groupBy("g")
        .agg(P["groupArraySample"]([5], F.col("x")).alias("s"))
        .first()["s"]
    )
    b = (
        df.repartition(7)
        .groupBy("g")
        .agg(P["groupArraySample"]([5], F.col("x")).alias("s"))
        .first()["s"]
    )
    assert list(a) == list(b) and len(a) == 5
    assert set(a) <= {f"v{i}" for i in range(50)}
    # n larger than the group: whole group, still deterministic
    small = spark.createDataFrame([(1, "x"), (1, "y")], "g int, x string")
    s = (
        small.groupBy("g")
        .agg(P["groupArraySample"]([9], F.col("x")).alias("s"))
        .first()["s"]
    )
    assert sorted(s) == ["x", "y"]


def test_group_array_last(spark):
    rows = [(1, 5, 50), (1, 1, 10), (1, 3, 30), (1, 4, 40), (1, 2, 20)]
    r = (
        spark.createDataFrame(rows, "g int, t long, x long")
        .groupBy("g")
        .agg(P["groupArrayLast"]([3], F.col("x"), F.col("t")).alias("l"))
        .first()
    )
    assert list(r["l"]) == [30, 40, 50]  # ascending-t, last 3
    r2 = (
        spark.createDataFrame(rows[:2], "g int, t long, x long")
        .groupBy("g")
        .agg(P["groupArrayLast"]([5], F.col("x"), F.col("t")).alias("l"))
        .first()
    )
    assert list(r2["l"]) == [10, 50]  # n > group size: whole group


def test_array_normalize(spark):
    r = (
        spark.range(1)
        .select(
            S["arrayNormalize"](
                F.array(F.lit(3.0), F.lit(4.0))
            ).alias("a"),
            S["arrayNormalize"](
                F.array(F.lit(0.0), F.lit(0.0))
            ).alias("z"),
            S["arrayNormalize"](F.array().cast("array<double>")).alias("e"),
        )
        .first()
    )
    assert list(r["a"]) == [0.6, 0.8]
    assert math.isclose(sum(v * v for v in r["a"]), 1.0)
    assert list(r["z"]) == [0.0, 0.0]  # zero vector unchanged
    assert list(r["e"]) == []


def test_series_period_detect(spark):
    # clean period-4 count series: score(4) dominates
    s4 = [5, 0, 1, 0] * 8
    # constant series: every lag scores equally -> tie to lag 1
    const = [3] * 12
    df = spark.createDataFrame(
        [(1, s4), (2, const), (3, [7]), (4, [1, 2])],
        "g int, a array<long>",
    )
    got = {
        r["g"]: r["p"]
        for r in df.select(
            "g",
            S["seriesPeriodDetect"](F.col("a"), F.lit(24)).alias("p"),
        ).collect()
    }
    assert got[1] == 4
    assert got[2] == 1          # exact tie -> smallest lag
    assert got[3] is None       # shorter than 2 points
    assert got[4] == 1          # single possible lag
    # maxlag clamps to len-1: series of 5 with maxlag 100 still works
    r = (
        spark.createDataFrame([([1, 9, 1, 9, 1],)], "a array<long>")
        .select(S["seriesPeriodDetect"](F.col("a"), F.lit(100)).alias("p"))
        .first()
    )
    assert r["p"] == 2


def test_series_period_rational_comparison(spark):
    """Cross-multiplied argmax: lag 2 with fewer terms but higher
    per-term product must beat lag 1 — the length correction at
    work (raw unnormalized dot would pick lag 1)."""
    a = [10, 0, 10, 0, 10, 0, 10]
    r = (
        spark.createDataFrame([(a,)], "a array<long>")
        .select(S["seriesPeriodDetect"](F.col("a"), F.lit(3)).alias("p"))
        .first()
    )
    # lag1: 0/6; lag2: 400/5 = 80; lag3: 0/4 -> 2
    assert r["p"] == 2


def test_grid_neighbor_join_complete_and_exact_once(spark):
    """The 3×3 grid join must find exactly the brute-force pair set
    (completeness: no pair escapes; uniqueness: no pair duplicated
    across shared cells)."""
    import random

    from nutdb_spark.operators.similarity import grid_neighbor_join

    rng = random.Random(41)
    pts = [(i, rng.randrange(0, 5000), rng.randrange(0, 5000))
           for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r["id_a"], r["id_b"], r["d2"])
        for r in grid_neighbor_join(
            df, "id", "x", "y", cell=600, radius_sq=600 * 600
        ).collect()
    )
    want = sorted(
        (a, b, d2)
        for ia, (a, xa, ya) in enumerate(pts)
        for b, xb, yb in pts[ia + 1:]
        if (d2 := (xa - xb) ** 2 + (ya - yb) ** 2) <= 600 * 600
    )
    assert got == want and len(got) == len(set((a, b) for a, b, _ in got))
    with pytest.raises(ValueError, match="cover"):
        grid_neighbor_join(df, "id", "x", "y", cell=10, radius_sq=600 * 600)


def test_grid_neighbor_join_plan_is_equi(spark):
    from nutdb_spark.operators.similarity import grid_neighbor_join

    df = spark.createDataFrame(
        [(i, i * 37 % 1000, i * 91 % 1000) for i in range(50)],
        "id long, x long, y long",
    )
    plan = (
        grid_neighbor_join(df, "id", "x", "y", cell=100, radius_sq=100 * 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_match_join_recovers_single_edits(spark):
    from nutdb_spark.operators.dedup import fuzzy_match_join

    clean = spark.createDataFrame(
        [(1, "chocolate"), (2, "lavender"), (3, "goldenrod"),
         (4, "turquoise")],
        "cid long, cname string",
    )
    dirty = spark.createDataFrame(
        [(10, "chocolte"),   # drop
         (11, "lavendre"),   # swap
         (12, "goldenrod"),  # exact
         (13, "zzzzzz")],    # garbage: no match
        "did long, dname string",
    )
    got = {
        r["did"]: (r["cid"], r["jw"])
        for r in fuzzy_match_join(
            dirty, clean,
            dirty_id="did", dirty_name="dname",
            clean_id="cid", clean_name="cname",
            threshold=0.9,
        ).collect()
    }
    assert got[10][0] == 1 and got[11][0] == 2
    assert got[12] == (3, 1.0)
    assert 13 not in got  # below threshold -> unmatched, not junk


def test_array_aucpr_hand_computed(spark):
    from nutdb_spark.functions.registry import SCALAR_FNS as SF

    def aucpr(sc, lb):
        return (
            spark.createDataFrame([(sc, lb)], "s array<long>, l array<long>")
            .select(SF["arrayAUCPR"](F.col("s"), F.col("l")).alias("a"))
            .first()["a"]
        )

    # sorted desc: (3,+) 1/1, (2,-), (1,+) 2/3 -> (1 + 2/3) / 2
    assert aucpr([3, 2, 1], [1, 0, 1]) == pytest.approx(5 / 6)
    # tie: pessimistic order puts the negative first -> (1/2) / 1
    assert aucpr([2, 2], [1, 0]) == 0.5
    assert aucpr([1, 2], [0, 0]) is None  # no positives
    assert aucpr([5], [1]) == 1.0


def test_tombstone_dedup_readmission(spark):
    """After a keeper is deleted, its key re-admits future arrivals;
    a live keeper's key still blocks them; decisions are never
    retroactive."""
    from nutdb_spark.operators.dedup import (
        incremental_exact_dedup_tombstone,
    )

    b1 = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb")], "id long, t string"
    )
    s1, idx1, _ = incremental_exact_dedup_tombstone(
        b1, None, "id", F.md5("t")
    )
    assert sorted(r["id"] for r in s1.collect()) == [1, 3]  # 2 dropped
    deletes = spark.createDataFrame([(1,)], "id long")  # delete keeper of aaa
    b2 = spark.createDataFrame(
        [(10, "aaa"), (11, "bbb"), (12, "aaa")], "id long, t string"
    )
    s2, idx2, purged = incremental_exact_dedup_tombstone(
        b2, idx1, "id", F.md5("t"), deletes=deletes
    )
    got = sorted(r["id"] for r in s2.collect())
    assert got == [10]  # aaa re-admitted (min id in delta); bbb blocked
    # the next index carries bbb's old keeper and aaa's NEW keeper
    nxt = {r["__keeper"] for r in purged.unionByName(idx2).collect()}
    assert nxt == {3, 10}
