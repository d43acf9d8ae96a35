"""Pins for the statistical / interval aggregate batch:
simpleLinearRegression, rankCorr (tie handling), intervalLengthSum,
maxIntersections[Position] edge geometry, and entropy — including
entropy's bounded two-level GROUP BY lowering (no collect_list of
group rows in the plan) and its value vs a Python reference.
"""

from __future__ import annotations

import math
import tempfile

import pyspark.sql.functions as F
import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.functions.registry import AGGREGATE_FNS as A


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def _agg(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    out = df.groupBy("g").agg(col.alias("v")).orderBy("g").collect()
    return [r["v"] for r in out]


def test_simple_linear_regression_exact(spark):
    rows = [(1, 1, 3), (1, 2, 5), (1, 3, 7), (1, 4, 10)]
    [v] = _agg(
        spark, rows, "g int, x int, y int",
        A["simpleLinearRegression"](F.col("x"), F.col("y")),
    )
    assert (v["k"], v["b"]) == (2.3, 0.5)


def test_simple_linear_regression_degenerate(spark):
    rows = [(1, 2, 3), (1, 2, 5)]  # zero x-variance
    [v] = _agg(
        spark, rows, "g int, x int, y int",
        A["simpleLinearRegression"](F.col("x"), F.col("y")),
    )
    assert v["k"] is None and v["b"] is None


def test_rank_corr_ties_and_sign(spark):
    # perfect monotone -> 1; reversed -> -1; ties averaged
    up = [(1, i, i * 3) for i in range(1, 6)]
    dn = [(2, i, 10 - i) for i in range(1, 6)]
    [a, b] = _agg(
        spark, up + dn, "g int, x int, y int",
        A["rankCorr"](F.col("x"), F.col("y")),
    )
    assert a == pytest.approx(1.0) and b == pytest.approx(-1.0)
    tie = [(1, 1, 1), (1, 2, 1), (1, 3, 2)]
    [t] = _agg(
        spark, tie, "g int, x int, y int",
        A["rankCorr"](F.col("x"), F.col("y")),
    )
    # ranks x: 1,2,3 ; y: 1.5,1.5,3 -> spearman = 0.866...
    assert t == pytest.approx(math.sqrt(3) / 2)


def test_interval_length_sum_geometry(spark):
    rows = [
        (1, 0, 10), (1, 5, 12), (1, 11, 14), (1, 13, 20),  # union 20
        (2, 0, 1), (2, 2, 3),                              # gap, 2
        (3, 0, 5), (3, 1, 2),                              # nested, 5
        (4, 0, 5), (4, 5, 7),                              # touching, 7
    ]
    out = _agg(
        spark, rows, "g int, s int, e int",
        A["intervalLengthSum"](F.col("s"), F.col("e")),
    )
    assert out == [20, 2, 5, 7]


def test_max_intersections_half_open(spark):
    rows = [
        (1, 0, 10), (1, 5, 12), (1, 11, 14), (1, 13, 20),
        (2, 0, 2), (2, 2, 4),  # touching: never overlap
        (3, 1, 5), (3, 2, 6), (3, 3, 7),  # 3 deep at p=3
    ]
    mi = _agg(
        spark, rows, "g int, s int, e int",
        A["maxIntersections"](F.col("s"), F.col("e")),
    )
    mip = _agg(
        spark, rows, "g int, s int, e int",
        A["maxIntersectionsPosition"](F.col("s"), F.col("e")),
    )
    assert mi == [2, 1, 3]
    assert mip == [5, 0, 3]


def test_entropy_value_and_uniform(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b"),
            (2, "x"), (2, "x"), (2, "x")]
    out = _agg(spark, rows, "g int, v string", A["entropy"](F.col("v")))
    assert out[0] == pytest.approx(1.0) and out[1] == pytest.approx(0.0)


def test_entropy_group_by_lowering_bounded(eng, sf_dir):
    """Dialect GROUP BY entropy must use the two-level histogram
    path: value matches the Python reference AND the plan has no
    collect_list (per-group row state)."""
    import duckdb

    df = eng.sql(
        "select l_returnflag as k, entropy(l_linestatus) as h "
        "from lineitem group by l_returnflag order by l_returnflag"
    )
    got = {r["k"]: r["h"] for r in df.collect()}
    con = duckdb.connect()
    ref = dict(
        con.execute(
            "with c as (select l_returnflag k, l_linestatus v, "
            f"count(*) c from read_parquet('{sf_dir}/lineitem.parquet')"
            " group by 1, 2) "
            "select k, log2(sum(c)) - sum(c*log2(c))/sum(c) "
            "from c group by k"
        ).fetchall()
    )
    for k, h in ref.items():
        assert got[k] == pytest.approx(h, abs=1e-12)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


def test_entropy_rollup_grand_total(eng):
    rows = eng.sql(
        "select l_returnflag as k, entropy(l_linestatus) as h "
        "from lineitem group by l_returnflag with rollup"
    ).collect()
    byk = {r["k"]: r["h"] for r in rows}
    assert None in byk and byk[None] is not None
    assert all(0.0 <= h <= 1.0 for h in byk.values())


def test_skew_kurt_samp_vs_numpy(spark):
    import numpy as np

    vals = [1, 2, 2, 3, 7, 9, 4, 4, 5]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    r = df.agg(
        A["skewSamp"](F.col("x")).alias("s"),
        A["kurtSamp"](F.col("x")).alias("k"),
    ).first()
    x = np.array(vals, float)
    n, mu = len(x), x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    sv = m2 * n / (n - 1)
    assert r["s"] == pytest.approx(m3 / (sv ** 0.5 * sv), rel=1e-9)
    assert r["k"] == pytest.approx(m4 / (sv * sv) - 3, rel=1e-9)


def test_skew_kurt_samp_degenerate(spark):
    df = spark.createDataFrame([(5,)], "x int")
    r = df.agg(
        A["skewSamp"](F.col("x")).alias("s"),
        A["kurtSamp"](F.col("x")).alias("k"),
    ).first()
    assert r["s"] is None and r["k"] is None  # n=1 -> NULL, no crash


def test_association_aggregates_vs_python(spark):
    """cramersV / cramersVBiasCorrected / contingency / theilsU vs a
    pure-Python reference on a hand-made contingency table."""
    import math
    from collections import Counter

    from nutdb_spark.engine import NutEngine

    data = [
        (1, 0, 0), (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 1),
        (1, 1, 0), (1, 2, 0), (1, 2, 2), (1, 2, 2), (1, 2, 2),
    ]
    eng = NutEngine(spark, data_dir="/root/testdata/sf0.001")
    df = spark.createDataFrame(data, "g int, x int, y int")
    df.createOrReplaceTempView("assoc_t")
    real = eng.resolve_table

    def resolve(name):
        if name == "assoc_t":
            return spark.table("assoc_t")
        return real(name)

    eng.resolve_table = resolve
    r = eng.sql(
        "select cramersV(x, y) as cv, contingency(x, y) as cont, "
        "cramersVBiasCorrected(x, y) as cvbc, theilsU(x, y) as tu "
        "from assoc_t group by g"
    ).first()

    xs = [d[1] for d in data]
    ys = [d[2] for d in data]
    n = len(data)
    o = Counter(zip(xs, ys))
    rx, cy = Counter(xs), Counter(ys)
    chi2 = n * sum(
        v * v / (rx[k[0]] * cy[k[1]]) for k, v in o.items()
    ) - n
    R, C = len(rx), len(cy)
    cv = math.sqrt(chi2 / (n * (min(R, C) - 1)))
    cont = math.sqrt(chi2 / (chi2 + n))
    phi2c = max(0.0, chi2 / n - (R - 1) * (C - 1) / (n - 1))
    k = min(R - (R - 1) ** 2 / (n - 1), C - (C - 1) ** 2 / (n - 1)) - 1
    cvbc = math.sqrt(phi2c / k)

    def H(vals):
        c = Counter(vals)
        return -sum(v / n * math.log(v / n) for v in c.values())

    hx, hy, hxy = H(xs), H(ys), H(list(zip(xs, ys)))
    tu = (hx + hy - hxy) / hx

    assert abs(r["cv"] - cv) < 1e-12
    assert abs(r["cont"] - cont) < 1e-12
    assert abs(r["cvbc"] - cvbc) < 1e-12
    assert abs(r["tu"] - tu) < 1e-9  # libm tolerance


# --- tier-11 two-sample test aggregates (r11) --------------------------------


def test_ttest_aggregates_match_reference(spark):
    from nutdb_spark.functions.registry import AGGREGATE_FNS
    from pyspark.sql import functions as F

    data = [
        (1, 10, 0), (1, 12, 0), (1, 14, 0),
        (1, 20, 1), (1, 22, 1), (1, 19, 1),
        (2, 5, 0), (2, 5, 1), (2, 5, 0), (2, 5, 1),  # zero variance
        (3, 7, 0), (3, 9, 0),                        # one-sided
    ]
    df = spark.createDataFrame(data, "g int, x int, i int")
    rows = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            AGGREGATE_FNS["studentTTest"](F.col("x"), F.col("i")).alias("st"),
            AGGREGATE_FNS["welchTTest"](F.col("x"), F.col("i")).alias("wt"),
            AGGREGATE_FNS["mannWhitneyUTest"](F.col("x"), F.col("i")).alias(
                "u"
            ),
        )
        .collect()
    }
    # hand-computed pooled/Welch t for {10,12,14} vs {20,22,19}
    import math

    m0, m1 = 12.0, 61.0 / 3
    v0, v1 = 4.0, 7.0 / 3
    sp2 = (2 * v0 + 2 * v1) / 4
    st = (m0 - m1) / math.sqrt(sp2 * (2 / 3))
    wt = (m0 - m1) / math.sqrt(v0 / 3 + v1 / 3)
    assert rows[1]["st"] == pytest.approx(st, rel=1e-12)
    assert rows[1]["wt"] == pytest.approx(wt, rel=1e-12)
    assert rows[1]["u"] == 9.0  # sample 1 strictly above: R1=15, U=9
    assert rows[2]["st"] is None and rows[2]["wt"] is None  # zero variance
    assert rows[2]["u"] == 2.0  # all tied at 5: midranks 2.5 each
    assert rows[3]["st"] is None and rows[3]["u"] is None  # one-sided


def test_ks_and_proportions_z(spark):
    from nutdb_spark.functions.registry import AGGREGATE_FNS, SCALAR_FNS
    from pyspark.sql import functions as F

    data = [(1, v, 0) for v in (1, 2, 3)] + [(1, v, 1) for v in (2, 4, 5, 5)]
    data += [(2, 7, 0), (2, 8, 0)]  # one-sided → NULL
    df = spark.createDataFrame(data, "g int, x int, i int")
    rows = {
        r["g"]: r["ks"]
        for r in df.groupBy("g")
        .agg(
            AGGREGATE_FNS["kolmogorovSmirnovTest"](
                F.col("x"), F.col("i")
            ).alias("ks")
        )
        .collect()
    }
    assert rows[1] == 0.75  # hand-computed max ECDF gap at x=3
    assert rows[2] is None

    import math

    r = spark.range(1).select(
        SCALAR_FNS["proportionsZTest"](
            F.lit(40), F.lit(30), F.lit(100), F.lit(100)
        ).alias("z"),
        SCALAR_FNS["proportionsZTest"](
            F.lit(0), F.lit(0), F.lit(100), F.lit(100)
        ).alias("degen"),
        SCALAR_FNS["proportionsZTest"](
            F.lit(5), F.lit(5), F.lit(0), F.lit(10)
        ).alias("zero_n"),
    ).first()
    p = 70 / 200
    want = (0.4 - 0.3) / math.sqrt(p * (1 - p) * (2 / 100))
    assert r["z"] == pytest.approx(want, rel=1e-12)
    assert r["degen"] is None and r["zero_n"] is None


def test_pvalue_family_against_table_anchors(spark):
    """Classic distribution-table anchors: t(df=10) two-sided critical
    values 2.228→0.05 and 1.812→0.10; z 1.96→0.05; plus betainc
    identities I_x(1,1)=x and I_0.5(2,2)=0.5."""
    from nutdb_spark.functions.registry import (
        _betainc,
        _t_pvalue,
        _z_pvalue,
    )
    from pyspark.sql import functions as F

    r = spark.range(1).select(
        _t_pvalue(F.lit(2.228139), F.lit(10.0)).alias("p05"),
        _t_pvalue(F.lit(1.812461), F.lit(10.0)).alias("p10"),
        _z_pvalue(F.lit(1.959964)).alias("z05"),
        _z_pvalue(F.lit(-1.959964)).alias("z05n"),
        _betainc(F.lit(1.0), F.lit(1.0), F.lit(0.37)).alias("b11"),
        _betainc(F.lit(2.0), F.lit(2.0), F.lit(0.5)).alias("b22"),
        _betainc(F.lit(5.0), F.lit(0.5), F.lit(0.0)).alias("b0"),
        _betainc(F.lit(5.0), F.lit(0.5), F.lit(1.0)).alias("b1"),
    ).first()
    assert r["p05"] == pytest.approx(0.05, abs=2e-6)
    assert r["p10"] == pytest.approx(0.10, abs=2e-6)
    assert r["z05"] == pytest.approx(0.05, abs=2e-6)
    assert r["z05n"] == r["z05"]  # two-sided: symmetric in z
    assert r["b11"] == pytest.approx(0.37, abs=1e-10)
    assert r["b22"] == pytest.approx(0.5, abs=1e-10)
    assert r["b0"] == 0.0 and r["b1"] == 1.0


def test_pvalue_aggregates_behave(spark):
    from nutdb_spark.functions.registry import AGGREGATE_FNS, SCALAR_FNS
    from pyspark.sql import functions as F

    # clearly separated samples → tiny p; identical samples → p ≈ 1
    far = [(1, v, 0) for v in (10, 11, 12, 13)] + [
        (1, v, 1) for v in (50, 51, 52, 53)
    ]
    same = [(2, v, i) for v in (5, 6, 7, 8) for i in (0, 1)]
    df = spark.createDataFrame(far + same, "g int, x int, i int")
    rows = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            AGGREGATE_FNS["studentTTestPValue"](
                F.col("x"), F.col("i")
            ).alias("sp"),
            AGGREGATE_FNS["welchTTestPValue"](F.col("x"), F.col("i")).alias(
                "wp"
            ),
            AGGREGATE_FNS["mannWhitneyUTestPValue"](
                F.col("x"), F.col("i")
            ).alias("up"),
            AGGREGATE_FNS["kolmogorovSmirnovTestPValue"](
                F.col("x"), F.col("i")
            ).alias("kp"),
        )
        .collect()
    }
    assert rows[1]["sp"] < 1e-6 and rows[1]["wp"] < 1e-6
    assert rows[1]["up"] < 0.05 and rows[1]["kp"] < 0.05
    assert rows[2]["sp"] > 0.9 and rows[2]["wp"] > 0.9
    assert rows[2]["up"] > 0.9 and rows[2]["kp"] > 0.5

    r = spark.range(1).select(
        SCALAR_FNS["proportionsZTestPValue"](
            F.lit(40), F.lit(30), F.lit(100), F.lit(100)
        ).alias("zp"),
        SCALAR_FNS["proportionsZTestPValue"](
            F.lit(50), F.lit(50), F.lit(100), F.lit(100)
        ).alias("zeq"),
    ).first()
    assert 0.1 < r["zp"] < 0.2  # z ≈ 1.48 → p ≈ 0.139
    assert r["zeq"] == pytest.approx(1.0, abs=1e-7)


def test_matrix_aggregates_vs_python(spark):
    """corrMatrix / covarSampMatrix against a from-scratch reference
    (approx — the bit-identity pin is the sql_agg_matrix oracle)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(77)
    rows = [
        (1, rng.randrange(100), rng.randrange(50), rng.randrange(25))
        for _ in range(60)
    ]
    r = (
        spark.createDataFrame(rows, "g int, x long, y long, z long")
        .groupBy("g")
        .agg(
            A["corrMatrix"](F.col("x"), F.col("y"), F.col("z")).alias("cm"),
            A["covarSampMatrix"](F.col("x"), F.col("y"), F.col("z")).alias(
                "vm"
            ),
        )
        .first()
    )
    xs = [[v[i] for _, *v in [(0, a, b, c) for _, a, b, c in rows]]
          for i in range(3)]
    n = len(rows)

    def cov(a, b):
        ma, mb = sum(a) / n, sum(b) / n
        return sum((u - ma) * (v - mb) for u, v in zip(a, b)) / (n - 1)

    for i in range(3):
        assert r["cm"][i][i] == 1.0
        for j in range(3):
            want_c = cov(xs[i], xs[j]) / (
                cov(xs[i], xs[i]) ** 0.5 * cov(xs[j], xs[j]) ** 0.5
            )
            assert r["cm"][i][j] == pytest.approx(want_c, rel=1e-9)
            assert r["cm"][i][j] == r["cm"][j][i]  # symmetric
            assert r["vm"][i][j] == pytest.approx(cov(xs[i], xs[j]), rel=1e-9)
    # degenerate: single row and zero variance -> NULL cells
    d = (
        spark.createDataFrame([(1, 5, 3)], "g int, x long, y long")
        .groupBy("g")
        .agg(A["corrMatrix"](F.col("x"), F.col("y")).alias("cm"))
        .first()
    )
    assert d["cm"][0][1] is None and d["cm"][0][0] is None
