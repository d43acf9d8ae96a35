"""Pins for the late-round-8 aggregate surface:

- the generated -If combinator family (CASE-WHEN-wrapped arguments ≡
  standard SQL FILTER) — null-skip semantics, multi-argument bases,
  empty-match behavior;
- avgWeighted / boundingRatio / singleValueOrNull / sumCount /
  minMap / maxMap;
- deltaSumTimestamp (and the documented deltaSum refusal);
- sequenceCount's greedy non-overlap semantics and time constraints;
- dictHas in both dictGet regimes.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.lower import LoweringError
from nutdb_spark.functions.registry import AGGREGATE_FNS, PARAMETRIC_AGGS


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


@pytest.fixture(scope="module")
def gdf(spark):
    return spark.createDataFrame(
        [
            (1, 10, "a", 1.0),
            (1, 20, "b", 2.0),
            (1, 30, "a", 4.0),
            (1, None, "z", 9.0),
            (2, 5, "c", 3.0),
        ],
        "g int, v int, s string, w double",
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


class TestIfCombinator:
    def test_matches_filter_semantics(self, gdf):
        cond = F.col("s") != "b"
        got = _one(
            gdf.filter("g = 1").agg(
                AGGREGATE_FNS["uniqExactIf"](F.col("s"), cond).alias("u"),
                AGGREGATE_FNS["argMaxIf"](
                    F.col("s"), F.col("v"), cond
                ).alias("am"),
                AGGREGATE_FNS["argMinIf"](
                    F.col("s"), F.col("v"), cond
                ).alias("an"),
                AGGREGATE_FNS["medianIf"](F.col("v"), cond).alias("md"),
            )
        )
        # rows kept: (10,a) (30,a) (null,z); uniqExact counts distinct s
        assert got["u"] == 2
        assert got["am"] == "a" and got["an"] == "a"
        assert got["md"] == 20.0

    def test_no_match_yields_null_or_zero(self, gdf):
        cond = F.lit(False)
        got = _one(
            gdf.agg(
                AGGREGATE_FNS["uniqExactIf"](F.col("s"), cond).alias("u"),
                AGGREGATE_FNS["argMaxIf"](
                    F.col("s"), F.col("v"), cond
                ).alias("am"),
                AGGREGATE_FNS["groupUniqArrayIf"](
                    F.col("s"), cond
                ).alias("ga"),
            )
        )
        assert got["u"] == 0
        assert got["am"] is None
        assert got["ga"] == []

    def test_two_argument_base_conditions_both_args(self, gdf):
        # corrIf must drop the whole ROW when cond fails, not mix a
        # conditioned x with an unconditioned y
        cond = F.col("v") < 25
        got = _one(
            gdf.filter("g = 1").agg(
                AGGREGATE_FNS["corrIf"](
                    F.col("v").cast("double"), F.col("w"), cond
                ).alias("c")
            )
        )
        # kept pairs: (10,1.0),(20,2.0) → perfect correlation
        assert got["c"] == pytest.approx(1.0)

    def test_sql_surface_resolves(self, eng):
        df = eng.sql(
            "select uniqExactIf(n_nationkey, n_regionkey = 0) as u "
            "from nation"
        )
        assert df.collect()[0]["u"] > 0


class TestMiscAggregates:
    def test_avg_weighted(self, gdf):
        got = _one(
            gdf.filter("g = 1").agg(
                AGGREGATE_FNS["avgWeighted"](F.col("v"), F.col("w")).alias(
                    "aw"
                )
            )
        )
        # x-null row contributes NO weight: (10+40+120)/(1+2+4)
        assert got["aw"] == pytest.approx(170.0 / 7.0)

    def test_avg_weighted_zero_weight_is_null(self, spark):
        df = spark.createDataFrame([(1, 0.0), (2, 0.0)], "v int, w double")
        got = _one(
            df.agg(
                AGGREGATE_FNS["avgWeighted"](F.col("v"), F.col("w")).alias(
                    "aw"
                )
            )
        )
        assert got["aw"] is None

    def test_bounding_ratio_and_single_point(self, gdf):
        got = gdf.groupBy("g").agg(
            AGGREGATE_FNS["boundingRatio"](F.col("v"), F.col("w")).alias(
                "br"
            )
        )
        by_g = {r["g"]: r["br"] for r in got.collect()}
        # g=1: (w@v=30 − w@v=10)/(30−10) = (4−1)/20
        assert by_g[1] == pytest.approx(0.15)
        assert by_g[2] is None  # zero width

    def test_single_value_or_null(self, gdf):
        got = gdf.groupBy("g").agg(
            AGGREGATE_FNS["singleValueOrNull"](F.col("g")).alias("sv"),
            AGGREGATE_FNS["singleValueOrNull"](F.col("s")).alias("sv2"),
        )
        by_g = {r["g"]: (r["sv"], r["sv2"]) for r in got.collect()}
        assert by_g[1] == (1, None)  # 4 distinct s values
        assert by_g[2] == (2, "c")

    def test_sum_count_struct(self, gdf):
        got = _one(
            gdf.filter("g = 1").agg(
                AGGREGATE_FNS["sumCount"](F.col("v")).alias("sc")
            )
        )
        assert got["sc"]["sum"] == 60 and got["sc"]["count"] == 3

    def test_min_max_map(self, gdf):
        got = _one(
            gdf.filter("g = 1").agg(
                AGGREGATE_FNS["minMap"](
                    F.array("s"), F.array("v")
                ).alias("mn"),
                AGGREGATE_FNS["maxMap"](
                    F.array("s"), F.array("v")
                ).alias("mx"),
            )
        )
        assert got["mn"] == {"a": 10, "b": 20, "z": None}
        assert got["mx"] == {"a": 30, "b": 20, "z": None}


class TestDeltaSum:
    def test_delta_sum_timestamp(self, spark):
        # values by ts order: 5, 8, 3, 10 → +3 +7 = 10
        df = spark.createDataFrame(
            [(4, 10.0), (1, 5.0), (3, 3.0), (2, 8.0)], "t int, v double"
        )
        got = _one(
            df.agg(
                AGGREGATE_FNS["deltaSumTimestamp"](
                    F.col("v"), F.col("t")
                ).alias("d")
            )
        )
        assert got["d"] == 10.0

    def test_delta_sum_refuses(self, eng):
        with pytest.raises(Exception, match="deltaSumTimestamp"):
            eng.sql("select deltaSum(l_quantity) as d from lineitem")


class TestSequenceCount:
    def _count(self, spark, events, pattern, n_conds=2):
        df = spark.createDataFrame(events, "t int, e string")
        conds = [F.col("e") == chr(ord("A") + k) for k in range(n_conds)]
        return _one(
            df.agg(
                PARAMETRIC_AGGS["sequenceCount"](
                    [pattern], F.col("t"), *conds
                ).alias("c")
            )
        )["c"]

    def test_greedy_non_overlap(self, spark):
        ev = [(1, "A"), (2, "B"), (3, "A"), (4, "B"), (5, "A")]
        assert self._count(spark, ev, "(?1)(?2)") == 2
        # one A, many B: a single chain, then no A to restart
        ev2 = [(1, "A"), (2, "B"), (3, "B"), (4, "B")]
        assert self._count(spark, ev2, "(?1)(?2)") == 1

    def test_time_constraints(self, spark):
        ev = [(1, "A"), (2, "B"), (10, "A"), (40, "B")]
        assert self._count(spark, ev, "(?1)(?t<=5)(?2)") == 1
        assert self._count(spark, ev, "(?1)(?t<=30)(?2)") == 2
        assert self._count(spark, ev, "(?1)(?t>5)(?2)") == 1

    def test_three_steps(self, spark):
        ev = [(1, "A"), (2, "B"), (3, "C"), (4, "A"), (5, "B"), (6, "C")]
        assert self._count(spark, ev, "(?1)(?2)(?3)", 3) == 2

    def test_matches_sequence_match_when_positive(self, spark):
        ev = [(1, "A"), (2, "B")]
        df = spark.createDataFrame(ev, "t int, e string")
        conds = [F.col("e") == "A", F.col("e") == "B"]
        got = _one(
            df.agg(
                PARAMETRIC_AGGS["sequenceCount"](
                    ["(?1)(?2)"], F.col("t"), *conds
                ).alias("c"),
                PARAMETRIC_AGGS["sequenceMatch"](
                    ["(?1)(?2)"], F.col("t"), *conds
                ).alias("m"),
            )
        )
        assert (got["c"] > 0) == got["m"]


class TestDictHas:
    def test_literal_regime(self, eng):
        rows = eng.sql(
            "select n_nationkey, dictHas('region', n_nationkey) as h "
            "from nation order by n_nationkey"
        ).collect()
        n_regions = eng.resolve_table("region").count()
        for r in rows:
            assert r["h"] == (r["n_nationkey"] < n_regions)

    def test_broadcast_regime(self, spark, eng):
        big = spark.range(0, 20001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        real = eng.resolve_table
        eng.resolve_table = lambda n: big if n == "bigdict" else real(n)
        got = eng.sql(
            "select countIf(h) as h, count() as n from "
            "(select dictHas('bigdict', n_nationkey) as h from nation) "
            "as p"
        ).collect()[0]
        assert got["h"] == got["n"]  # every nationkey < 20001
        # aggregate-argument position cannot host the broadcast join:
        # the documented loud failure, not a silent wrong answer
        with pytest.raises(LoweringError, match="broadcast"):
            eng.sql(
                "select countIf(dictHas('bigdict', n_nationkey)) as h "
                "from nation"
            )

    def test_wrong_arity_raises(self, eng):
        with pytest.raises(LoweringError, match="dictHas"):
            eng.sql("select dictHas('region') as h from nation")


class TestTier4Scalars:
    """The tier-4 names whose outputs are nondeterministic or
    engine-typed (not oracle-able) — pinned here instead."""

    def test_uuid_and_rand_shapes(self, eng):
        r = eng.sql(
            "select uuid() as u, generateUUIDv4() as u2, rand() as r32, "
            "rand64() as r64, randCanonical() as rc, "
            "randUniform(5, 6) as ru, randNormal(0, 1) as rn "
            "from nation limit 3"
        ).collect()
        assert len({row["u"] for row in r}) == 3  # distinct per row
        for row in r:
            assert len(row["u"]) == 36 and row["u"].count("-") == 4
            assert 0 <= row["r32"] < 2**32
            assert 0 <= row["rc"] < 1.0
            assert 5.0 <= row["ru"] < 6.0

    def test_to_type_name(self, eng):
        r = eng.sql(
            "select toTypeName(n_nationkey) as a, toTypeName('x') as b, "
            "toTypeName(1.5) as c from nation limit 1"
        ).collect()[0]
        assert r["a"] in ("int", "bigint") and r["b"] == "string"
        assert r["c"] == "double"

    def test_date_add_subday_promotes(self, eng):
        r = eng.sql(
            "select dateAdd('hour', 5, toDate('2024-01-01')) as h, "
            "dateAdd('minute', 90, toDate('2024-01-01')) as m, "
            "dateSub('second', 30, toDate('2024-01-01')) as s "
            "from nation limit 1"
        ).collect()[0]
        assert str(r["h"]) == "2024-01-01 05:00:00"
        assert str(r["m"]) == "2024-01-01 01:30:00"
        assert str(r["s"]) == "2023-12-31 23:59:30"

    def test_date_add_bad_unit_raises(self, eng):
        with pytest.raises(Exception, match="unsupported unit"):
            eng.sql(
                "select dateAdd('fortnight', 1, toDate('2024-01-01')) "
                "as x from nation limit 1"
            ).collect()

    def test_tuple_element_bad_arg_raises(self, eng):
        with pytest.raises(LoweringError, match="tupleElement"):
            eng.sql(
                "select tupleElement(tuple(1, 2), n_nationkey) as x "
                "from nation limit 1"
            )

    def test_misc_edges(self, eng):
        r = eng.sql(
            "select intExp2(-1) as a, intExp10(-2) as b, "
            "roundToExp2(0) as c, formatReadableSize(0) as d, "
            "multiSearchAny('x', emptyArrayString()) as e, "
            "toNullable(7) as f, char(72, 105) as g, "
            "mapFromArrays(['a'], [1])['a'] as h "
            "from nation limit 1"
        ).collect()[0]
        assert (r["a"], r["b"], r["c"]) == (0, 0, 0)
        assert r["d"] == "0.00 B"
        assert r["e"] is False
        assert r["f"] == 7 and r["g"] == "Hi" and r["h"] == 1


class TestSequenceCountProperty:
    def test_matches_reference_automaton_many_groups(self, spark):
        """200 random event strings, ONE aggregate — each group's
        greedy count must equal a Python replay of the automaton,
        with and without a time constraint."""
        import random

        rng = random.Random(0xC0FFEE)
        rows = []
        for g in range(200):
            n = rng.randint(0, 12)
            for i in range(n):
                rows.append((g, i * rng.randint(1, 3), rng.choice("AB")))
        # unique ts per group: make ts strictly increasing
        fixed = []
        for g in range(200):
            evs = sorted(
                [r for r in rows if r[0] == g], key=lambda r: r[1]
            )
            t = 0
            for _, step, e in evs:
                t += 1 + step
                fixed.append((g, t, e))
        if not fixed:
            fixed = [(0, 1, "A")]
        df = spark.createDataFrame(fixed, "g int, t int, e string")

        def ref(events, gap=None):
            j, lt, cnt = 0, None, 0
            for t, e in events:
                need = "A" if j == 0 else "B"
                hit = e == need
                if j == 1 and gap is not None:
                    hit = hit and (t - lt <= gap)
                if hit:
                    j += 1
                    lt = t
                    if j == 2:
                        j, lt = 0, None
                        cnt += 1
            return cnt

        got = {
            r["g"]: (r["c"], r["cg"])
            for r in df.groupBy("g")
            .agg(
                PARAMETRIC_AGGS["sequenceCount"](
                    ["(?1)(?2)"], F.col("t"),
                    F.col("e") == "A", F.col("e") == "B",
                ).alias("c"),
                PARAMETRIC_AGGS["sequenceCount"](
                    ["(?1)(?t<=4)(?2)"], F.col("t"),
                    F.col("e") == "A", F.col("e") == "B",
                ).alias("cg"),
            )
            .collect()
        }
        by_g = {}
        for g, t, e in fixed:
            by_g.setdefault(g, []).append((t, e))
        for g, evs in by_g.items():
            evs.sort()
            assert got[g] == (ref(evs), ref(evs, gap=4)), (g, evs)


# --- intExp2 overflow guard (r9 ADVICE fix pin, re-added per r10 ADVICE) ----
# The JVM shiftleft masks the shift amount to 6 bits, so unguarded
# intExp2(64) silently returned 1 and intExp2(63) a negative long.


def test_intexp2_overflow_guard(eng):
    row = eng.sql(
        "select intExp2(62) as a, intExp2(63) as b, intExp2(64) as c, "
        "intExp2(0) as d, intExp2(-1) as e"
    ).first()
    assert row["a"] == 2**62
    assert row["b"] == 0  # would be negative under raw shiftleft
    assert row["c"] == 0  # JVM masks shift to 6 bits → raw would be 1
    assert row["d"] == 1
    assert row["e"] == 0
