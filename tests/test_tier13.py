"""Tier-13 armor: analysisOfVariance (+ p-value), sparkbar,
groupArrayInsertAt, toDecimalString, regexpQuoteMeta,
normalizeQuery / normalizedQueryHash.

The oracled suite entries (sql_agg_anova, sql_fn_tier13) pin the
DuckDB bit-identity; these tests pin the VALUES against independent
Python references plus the degenerate/edge branches the fixtures
can't reach.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import (
    AGGREGATE_FNS as A,
    PARAMETRIC_AGGS as P,
    SCALAR_FNS as S,
)


def _anova_ref(pairs):
    """One-way ANOVA F from first principles (floats are fine — the
    engine's fold is compared with approx, the bit-identity pin lives
    in the DuckDB oracle)."""
    groups: dict[int, list[int]] = {}
    for x, g in pairs:
        groups.setdefault(g, []).append(x)
    n = len(pairs)
    k = len(groups)
    if k < 2 or n <= k:
        return None
    grand = sum(x for x, _ in pairs) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    if ssw <= 0:
        return None
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_matches_python_reference(spark):
    rng = random.Random(1307)
    rows = [
        (gid, rng.randrange(0, 500), rng.randrange(0, 4))
        for gid in range(8)
        for _ in range(rng.randrange(6, 40))
    ]
    got = {
        r["g"]: r["f"]
        for r in spark.createDataFrame(rows, "g int, x long, grp long")
        .groupBy("g")
        .agg(A["analysisOfVariance"](F.col("x"), F.col("grp")).alias("f"))
        .collect()
    }
    for gid in range(8):
        ref = _anova_ref([(x, gr) for g, x, gr in rows if g == gid])
        if ref is None:
            assert got[gid] is None
        else:
            assert got[gid] == pytest.approx(ref, rel=1e-9)


def test_anova_degenerate_branches(spark):
    rows = [
        (1, 5, 0), (1, 7, 0),            # one group -> NULL
        (2, 5, 0), (2, 5, 1),            # n <= k -> NULL
        (3, 5, 0), (3, 5, 0), (3, 9, 1), (3, 9, 1),  # zero SSW -> NULL
        (4, 1, 0), (4, 3, 0), (4, 10, 1), (4, 14, 1),  # healthy
    ]
    got = {
        r["g"]: r["f"]
        for r in spark.createDataFrame(rows, "g int, x long, grp long")
        .groupBy("g")
        .agg(A["analysisOfVariance"](F.col("x"), F.col("grp")).alias("f"))
        .collect()
    }
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == pytest.approx(_anova_ref([(1, 0), (3, 0), (10, 1), (14, 1)]))


def test_anova_pvalue_equals_ttest_on_two_groups(spark):
    """With k = 2, F = t² and the F(1, n−2) upper tail equals the
    two-sided t(n−2) tail — the classic identity, which ties the new
    p-value straight to the already-anchored t machinery."""
    rows = [(1, v, 0) for v in (10, 12, 14, 11)] + [
        (1, v, 1) for v in (20, 23, 21, 26)
    ]
    r = (
        spark.createDataFrame(rows, "g int, x long, grp long")
        .groupBy("g")
        .agg(
            A["analysisOfVariance"](F.col("x"), F.col("grp")).alias("f"),
            A["analysisOfVariancePValue"](F.col("x"), F.col("grp")).alias(
                "fp"
            ),
            A["studentTTest"](F.col("x"), F.col("grp")).alias("t"),
            A["studentTTestPValue"](F.col("x"), F.col("grp")).alias("tp"),
        )
        .first()
    )
    assert r["f"] == pytest.approx(r["t"] ** 2, rel=1e-12)
    assert r["fp"] == pytest.approx(r["tp"], rel=1e-6)
    r2 = (
        spark.createDataFrame(
            [(1, v, v % 3) for v in range(30)], "g int, x long, grp long"
        )
        .groupBy("g")
        .agg(
            A["analysisOfVariancePValue"](F.col("x"), F.col("grp")).alias(
                "fp"
            )
        )
        .first()
    )
    assert 0.0 <= r2["fp"] <= 1.0


def test_sparkbar_known_shape(spark):
    # x 0..7 with weights 1..8 over 8 buckets: strictly rising bar
    rows = [(1, x, x + 1) for x in range(8)]
    r = (
        spark.createDataFrame(rows, "g int, x long, y long")
        .groupBy("g")
        .agg(P["sparkbar"]([8], F.col("x"), F.col("y")).alias("sb"))
        .first()
    )
    assert r["sb"] == "▁▂▃▄▅▆▇█"


def test_sparkbar_empty_bucket_and_uniform(spark):
    rows = [(1, 0, 5), (1, 3, 5)]  # width 4, buckets 1..2 empty
    r = (
        spark.createDataFrame(rows, "g int, x long, y long")
        .groupBy("g")
        .agg(P["sparkbar"]([4], F.col("x"), F.col("y")).alias("sb"))
        .first()
    )
    assert r["sb"] == "█░░█"


def test_group_array_insert_at(spark):
    rows = [
        (1, 9, 0),
        (1, 4, 2), (1, 7, 2),   # collision -> min = 4
        (1, 5, 99),             # out of range -> ignored
    ]
    r = (
        spark.createDataFrame(rows, "g int, x long, p long")
        .groupBy("g")
        .agg(
            P["groupArrayInsertAt"]([-1, 4], F.col("x"), F.col("p")).alias(
                "a"
            )
        )
        .first()
    )
    assert list(r["a"]) == [9, -1, 4, -1]


def test_to_decimal_string(spark):
    rows = [
        (1.5, 2, "1.50"),
        (-1.005, 0, "-1"),
        (0.125, 2, "0.13"),       # scaled half-up, by construction
        (123.456, 3, "123.456"),
        (2.0, 5, "2.00000"),
    ]
    df = spark.createDataFrame(
        [(x, s) for x, s, _ in rows], "x double, s int"
    )
    got = [
        r["d"]
        for r in df.select(
            S["toDecimalString"](F.col("x"), F.col("s")).alias("d")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]
    bad = (
        spark.range(1)
        .select(
            S["toDecimalString"](F.lit(1.0), F.lit(16)).alias("hi"),
            S["toDecimalString"](F.lit(1.0), F.lit(-1)).alias("lo"),
            S["toDecimalString"](F.lit(None).cast("double"), F.lit(2)).alias(
                "nn"
            ),
        )
        .first()
    )
    assert bad["hi"] is None and bad["lo"] is None and bad["nn"] is None


def test_regexp_quote_meta_roundtrip(spark):
    """The escaped form used as a pattern must match the original
    literally — the defining property."""
    samples = ["a.b*c", "x[1]{2}", "(a|b)?", "c:\\d+", "plain", "a-b^$"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    out = df.select(
        "s",
        S["regexpQuoteMeta"](F.col("s")).alias("q"),
        F.regexp_like(
            F.col("s"),
            F.concat(
                F.lit("^"), S["regexpQuoteMeta"](F.col("s")), F.lit("$")
            ),
        ).alias("m"),
    ).collect()
    assert all(r["m"] for r in out)
    byval = {r["s"]: r["q"] for r in out}
    assert byval["a.b*c"] == r"a\.b\*c"
    assert byval["plain"] == "plain"


def test_normalize_query_and_hash(spark):
    q1 = "SELECT a FROM t WHERE id = 42 AND n = 'bob' AND k IN (1, 2, 3)"
    q2 = "SELECT a FROM t WHERE id = 7 AND n = 'eve' AND k IN (5, 6)"
    q3 = "SELECT b FROM t WHERE id = 42"
    df = spark.createDataFrame([(q1,), (q2,), (q3,)], "q string")
    rows = df.select(
        S["normalizeQuery"](F.col("q")).alias("n"),
        S["normalizedQueryHash"](F.col("q")).alias("h"),
    ).collect()
    n1, n2, n3 = (r["n"] for r in rows)
    h1, h2, h3 = (r["h"] for r in rows)
    assert n1 == n2 == "SELECT a FROM t WHERE id = ? AND n = ? AND k IN (?..)"
    assert h1 == h2 and h1 != h3
    assert "42" not in n3 and n3.endswith("id = ?")


def test_position_case_insensitive_utf8(spark):
    r = (
        spark.range(1)
        .select(
            S["positionCaseInsensitiveUTF8"](
                F.lit("Hello WORLD"), F.lit("world")
            ).alias("p"),
            S["positionCaseInsensitiveUTF8"](
                F.lit("abc"), F.lit("zz")
            ).alias("z"),
        )
        .first()
    )
    assert r["p"] == 7 and r["z"] == 0


def test_quantile_exact_interp_vs_statistics(spark):
    """Inclusive matches numpy/statistics 'inclusive' exclusive
    matches PERCENTILE.EXC on a hand-checked vector."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, x long")
    r = (
        df.groupBy("g")
        .agg(
            P["quantileExactExclusive"]([0.25], F.col("x")).alias("qe"),
            P["quantileExactInclusive"]([0.25], F.col("x")).alias("qi"),
            P["quantileExactExclusive"]([0.01], F.col("x")).alias("lo"),
        )
        .first()
    )
    import statistics

    assert r["qi"] == statistics.quantiles(vals, n=4, method="inclusive")[0]
    assert r["qe"] == statistics.quantiles(vals, n=4, method="exclusive")[0]
    assert r["lo"] is None  # h = 0.09 < 1 -> out of support
    single = (
        spark.createDataFrame([(1, 7)], "g int, x long")
        .groupBy("g")
        .agg(
            # n=1: h = 0.5*(n+1) = 1.0 is exactly in support -> 7.0;
            # p=0.4 gives h = 0.8 < 1 -> out of support
            P["quantileExactExclusive"]([0.5], F.col("x")).alias("qe"),
            P["quantileExactExclusive"]([0.4], F.col("x")).alias("qe4"),
            P["quantileExactInclusive"]([0.5], F.col("x")).alias("qi"),
        )
        .first()
    )
    assert single["qe"] == 7.0 and single["qe4"] is None
    assert single["qi"] == 7.0


def test_array_partial_sort_tail_order_and_dups(spark):
    r = (
        spark.range(1)
        .select(
            S["arrayPartialSort"](
                F.lit(3), F.array(*[F.lit(v) for v in [5, 1, 3, 1, 4, 3]])
            ).alias("ps"),
            S["arrayPartialReverseSort"](
                F.lit(2), F.array(*[F.lit(v) for v in [5, 1, 3, 1, 4, 3]])
            ).alias("prs"),
            S["arrayPartialSort"](
                F.lit(99), F.array(F.lit(2), F.lit(1))
            ).alias("big"),
        )
        .first()
    )
    # head = [1,1,3]; tail keeps 5, 4 and the SECOND 3 in原 order
    assert list(r["ps"]) == [1, 1, 3, 5, 4, 3]
    # reverse head = [5,4]; tail = 1,3,1,3 in original order
    assert list(r["prs"]) == [5, 4, 1, 3, 1, 3]
    assert list(r["big"]) == [1, 2]  # k > len -> fully sorted


def test_array_zip_unaligned(spark):
    r = (
        spark.range(1)
        .select(
            S["arrayZipUnaligned"](
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.array(F.lit(9)),
            ).alias("z")
        )
        .first()
    )
    assert [(t["_1"], t["_2"]) for t in r["z"]] == [
        (1, 9), (2, None), (3, None)
    ]


def test_bitmap_family_edges(spark):
    r = (
        spark.range(1)
        .select(
            S["bitmapXor"](
                F.array(F.lit(1), F.lit(2), F.lit(2)),
                F.array(F.lit(2), F.lit(3)),
            ).alias("x"),
            S["bitmapHasAll"](
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.array(F.lit(2), F.lit(3)),
            ).alias("all1"),
            S["bitmapHasAll"](
                F.array(F.lit(1)), F.array(F.lit(1), F.lit(9))
            ).alias("all2"),
            S["bitmapSubsetLimit"](
                F.array(F.lit(5), F.lit(1), F.lit(9), F.lit(7)),
                F.lit(5), F.lit(2),
            ).alias("sl"),
        )
        .first()
    )
    assert list(r["x"]) == [1, 3]
    assert r["all1"] is True and r["all2"] is False
    assert list(r["sl"]) == [5, 7]


def test_group_bitmap_aggregates(spark):
    rows = [
        (1, [1, 2, 3]), (1, [2, 3, 4]), (1, [3, 2]),
        (2, [7]),
    ]
    r = {
        row["g"]: row
        for row in spark.createDataFrame(rows, "g int, a array<long>")
        .groupBy("g")
        .agg(
            A["groupBitmapAnd"](F.col("a")).alias("band"),
            A["groupBitmapOr"](F.col("a")).alias("bor"),
            A["groupBitmapXor"](F.col("a")).alias("bxor"),
        )
        .collect()
    }
    # g1: and {2,3}=2; or {1,2,3,4}=4; xor: 1(x1),2(x3),3(x3),4(x1) all odd=4
    assert (r[1]["band"], r[1]["bor"], r[1]["bxor"]) == (2, 4, 4)
    assert (r[2]["band"], r[2]["bor"], r[2]["bxor"]) == (1, 1, 1)


def test_resample_combinators(spark):
    rows = [
        (1, 10, 0), (1, 20, 1), (1, 30, 2), (1, 40, 5),  # key 5 ignored
        (1, 50, 3),
    ]
    df = spark.createDataFrame(rows, "g int, x long, k long")
    r = (
        df.groupBy("g")
        .agg(
            P["sumResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("s"),
            P["countResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("c"),
            P["maxResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("m"),
            P["avgResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("a"),
        )
        .first()
    )
    # buckets [0,2) and [2,4): keys 0,1 -> b0; 2,3 -> b1; 5 ignored
    assert list(r["s"]) == [30, 80]
    assert list(r["c"]) == [2, 2]
    assert list(r["m"]) == [20, 50]
    assert list(r["a"]) == [15.0, 40.0]
    # empty bucket: sum/count 0, max/avg NULL
    r2 = (
        spark.createDataFrame([(1, 7, 0)], "g int, x long, k long")
        .groupBy("g")
        .agg(
            P["sumResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("s"),
            P["maxResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("m"),
            P["avgResample"]([0, 4, 2], F.col("x"), F.col("k")).alias("a"),
        )
        .first()
    )
    assert list(r2["s"]) == [7, 0]
    assert list(r2["m"]) == [7, None]
    assert list(r2["a"]) == [7.0, None]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap"):
        P["sumResample"]([0, 10**9, 1], F.col("x"), F.col("k"))
    with _pytest.raises(ValueError, match="step"):
        P["sumResample"]([4, 0, 2], F.col("x"), F.col("k"))


def test_anova_rejects_out_of_range_groups(spark):
    """Group ids outside [0, 8) would corrupt the x·8+g packing (g=9
    decodes as x+1, group 1) — the guard must return NULL, validated
    on the RAW group column, never a plausible-looking wrong F."""
    healthy = [(1, 1, 0), (1, 3, 0), (1, 10, 1), (1, 14, 1)]
    bad_hi = [(2, 1, 0), (2, 3, 0), (2, 10, 9), (2, 14, 9)]
    bad_neg = [(3, 1, -1), (3, 3, -1), (3, 10, 1), (3, 14, 1)]
    got = {
        r["g"]: (r["f"], r["fp"])
        for r in spark.createDataFrame(
            healthy + bad_hi + bad_neg, "g int, x long, grp long"
        )
        .groupBy("g")
        .agg(
            A["analysisOfVariance"](F.col("x"), F.col("grp")).alias("f"),
            A["analysisOfVariancePValue"](F.col("x"), F.col("grp")).alias(
                "fp"
            ),
        )
        .collect()
    }
    assert got[1][0] == pytest.approx(
        _anova_ref([(1, 0), (3, 0), (10, 1), (14, 1)])
    )
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_sparkbar_all_zero_weights_and_boundary_ids(spark):
    """mw ≤ 0 short-circuits to the all-empty bar (no division), and
    group ids at the packing boundary (0 and 7) stay exact."""
    rows_zero = [(1, 0, 0), (1, 3, 0)]
    rows_edge = [(2, x, 1) for x in range(4)]
    got = {
        r["g"]: r["sb"]
        for r in spark.createDataFrame(
            rows_zero + rows_edge, "g int, x long, y long"
        )
        .groupBy("g")
        .agg(P["sparkbar"]([4], F.col("x"), F.col("y")).alias("sb"))
        .collect()
    }
    assert got[1] == "░░░░"
    assert got[2] == "████"


def test_sparkbar_integer_exact_past_2_53(spark):
    """The documented integer bucket math must hold where double
    division breaks: (x−mn)·width near 2^60 with a huge span. The pin
    is an independent Python integer-division replay."""
    mn, span_mx = 0, (1 << 60) - 1
    xs = [0, (1 << 60) // 3 + 1, (1 << 59) + 7, span_mx]
    width = 8
    span = span_mx - mn + 1
    buckets = [((x - mn) * width) // span for x in xs]
    weights = [sum(1 for b in buckets if b == i) for i in range(width)]
    mw = max(weights)
    glyphs = "░▁▂▃▄▅▆▇█"
    expect = "".join(
        glyphs[0 if w <= 0 else (w * 8 + mw - 1) // mw] for w in weights
    )
    r = (
        spark.createDataFrame([(1, x, 1) for x in xs], "g int, x long, y long")
        .groupBy("g")
        .agg(P["sparkbar"]([width], F.col("x"), F.col("y")).alias("sb"))
        .first()
    )
    assert r["sb"] == expect
