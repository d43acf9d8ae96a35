"""Randomized armor for the session-6 aggregate batch: 200 random
groups, ONE Spark pass per aggregate family, each group's value
replayed by an independent Python reference (same discipline as the
sequenceCount automaton test).
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
import pytest

from nutdb_spark.functions.registry import AGGREGATE_FNS as A


def _groups(seed, lo=0, hi=12, maker=None):
    rng = random.Random(seed)
    out = {}
    for g in range(200):
        out[g] = [maker(rng) for _ in range(rng.randint(lo, hi))]
    return out


def test_interval_length_sum_vs_python(spark):
    data = _groups(
        0xA11CE,
        maker=lambda r: (r.randint(0, 40), r.randint(0, 25)),
    )
    rows = [
        (g, s, s + d + 1) for g, ivs in data.items() for s, d in ivs
    ]
    rows.append((999, 0, 1))  # never empty
    df = spark.createDataFrame(rows, "g int, s int, e int")
    got = {
        r["g"]: r["v"]
        for r in df.groupBy("g")
        .agg(A["intervalLengthSum"](F.col("s"), F.col("e")).alias("v"))
        .collect()
    }

    def ref(ivs):
        total, cov = 0, None
        for s, e in sorted(ivs):
            total += max(0, e - max(s, cov if cov is not None else s))
            cov = e if cov is None else max(cov, e)
        return total

    for g, ivs in data.items():
        if ivs:
            assert got[g] == ref(
                [(s, s + d + 1) for s, d in ivs]
            ), g


def test_max_intersections_vs_python(spark):
    data = _groups(
        0xBEEF,
        lo=1,
        maker=lambda r: (r.randint(0, 30), r.randint(1, 10)),
    )
    rows = [(g, s, s + d) for g, ivs in data.items() for s, d in ivs]
    df = spark.createDataFrame(rows, "g int, s int, e int")
    got = {
        r["g"]: (r["mi"], r["mp"])
        for r in df.groupBy("g")
        .agg(
            A["maxIntersections"](F.col("s"), F.col("e")).alias("mi"),
            A["maxIntersectionsPosition"](F.col("s"), F.col("e")).alias(
                "mp"
            ),
        )
        .collect()
    }

    def ref(ivs):
        pts = sorted(
            [(s, 1) for s, e in ivs] + [(e, -1) for s, e in ivs]
        )
        cur = best = 0
        at = None
        for p, d in pts:
            cur += d
            if cur > best:
                best, at = cur, p
        return best, at

    for g, ivs in data.items():
        assert got[g] == ref([(s, s + d) for s, d in ivs]), g


def test_rank_corr_vs_python(spark):
    data = _groups(
        0xD00D,
        lo=2,
        maker=lambda r: (r.randint(0, 6), r.randint(0, 6)),
    )
    rows = [(g, x, y) for g, ps in data.items() for x, y in ps]
    df = spark.createDataFrame(rows, "g int, x int, y int")
    got = {
        r["g"]: r["v"]
        for r in df.groupBy("g")
        .agg(A["rankCorr"](F.col("x"), F.col("y")).alias("v"))
        .collect()
    }

    def dranks(vals):
        return [
            2 * sum(1 for t in vals if t < v)
            + sum(1 for t in vals if t == v)
            + 1
            for v in vals
        ]

    def ref(ps):
        xs, ys = [p[0] for p in ps], [p[1] for p in ps]
        u, v = dranks(xs), dranks(ys)
        n = len(ps)
        su, sv = sum(u), sum(v)
        suv = sum(a * b for a, b in zip(u, v))
        suu = sum(a * a for a in u)
        svv = sum(b * b for b in v)
        den = math.sqrt(n * suu - su * su) * math.sqrt(n * svv - sv * sv)
        if den == 0:
            return None
        return (n * suv - su * sv) / den

    for g, ps in data.items():
        expect = ref(ps)
        if expect is None:
            assert got[g] is None, g
        else:
            assert got[g] == pytest.approx(expect, rel=1e-12), g


def test_entropy_vs_python(spark):
    data = _groups(
        0xFACE, lo=1, maker=lambda r: r.choice("abcde")
    )
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g int, v string")
    got = {
        r["g"]: r["h"]
        for r in df.groupBy("g")
        .agg(A["entropy"](F.col("v")).alias("h"))
        .collect()
    }

    def ref(vs):
        n = len(vs)
        return -sum(
            (vs.count(c) / n) * math.log2(vs.count(c) / n)
            for c in set(vs)
        )

    for g, vs in data.items():
        assert got[g] == pytest.approx(ref(vs), abs=1e-12), g


def test_or_null_if_vs_filtered_python(spark):
    rng = random.Random(0x5EED)
    rows = [
        (g, rng.randint(-5, 20)) for g in range(200) for _ in range(
            rng.randint(0, 6)
        )
    ]
    rows.append((999, 1))
    df = spark.createDataFrame(rows, "g int, x int")
    got = {
        r["g"]: (r["sn"], r["sd"], r["cn"])
        for r in df.groupBy("g")
        .agg(
            A["sumOrNullIf"](F.col("x"), F.col("x") > 10).alias("sn"),
            A["sumOrDefaultIf"](F.col("x"), F.col("x") > 10).alias("sd"),
            A["countOrNullIf"](F.col("x"), F.col("x") > 10).alias("cn"),
        )
        .collect()
    }
    from collections import defaultdict

    byg = defaultdict(list)
    for g, x in rows:
        byg[g].append(x)
    for g, xs in byg.items():
        kept = [x for x in xs if x > 10]
        assert got[g] == (
            sum(kept) if kept else None,
            sum(kept) if kept else 0,
            len(kept) if kept else None,
        ), g


def test_url_family_roundtrip_fuzz(spark):
    """200 random well-formed URLs assembled from component pools —
    every extractor must return exactly the component that built the
    URL, and the cutters must reassemble to the original."""
    import random

    from nutdb_spark.functions.registry import SCALAR_FNS as S

    rng = random.Random(0x0501)
    hosts = ["example.com", "a.b.site.io", "x.co", "news.port.com.tr",
             "localhost"]
    rows = []
    for i in range(200):
        scheme = rng.choice(["http", "https", "ftp"])
        host = rng.choice(hosts)
        port = rng.choice(["", f":{rng.randint(1, 65000)}"])
        path = rng.choice(["", "/", f"/p{i}", f"/a/b{i}/c"])
        n_params = rng.randint(0, 3)
        params = "&".join(
            f"k{j}=v{rng.randint(0, 9)}" for j in range(n_params)
        )
        query = f"?{params}" if params else ""
        frag = rng.choice(["", f"#f{i}"])
        rows.append(
            (i, f"{scheme}://{host}{port}{path}{query}{frag}",
             scheme, host, port[1:], path, params, frag[1:])
        )
    df = spark.createDataFrame(
        rows, "i int, u string, scheme string, host string, "
        "port string, path string, query string, frag string"
    )
    from pyspark.sql import functions as F

    got = df.select(
        "i", "u", "scheme", "host", "port", "path", "query", "frag",
        S["protocol"](F.col("u")).alias("g_scheme"),
        S["domain"](F.col("u")).alias("g_host"),
        S["port"](F.col("u")).alias("g_port"),
        S["path"](F.col("u")).alias("g_path"),
        S["queryString"](F.col("u")).alias("g_query"),
        S["fragment"](F.col("u")).alias("g_frag"),
        S["cutQueryStringAndFragment"](F.col("u")).alias("g_cut"),
    ).collect()
    for r in got:
        assert r["g_scheme"] == r["scheme"], r["u"]
        assert r["g_host"] == r["host"], r["u"]
        assert r["g_port"] == (int(r["port"]) if r["port"] else 0), r["u"]
        assert r["g_path"] == r["path"], r["u"]
        assert r["g_query"] == r["query"], r["u"]
        assert r["g_frag"] == r["frag"], r["u"]
        scheme, host, port = r["scheme"], r["host"], r["port"]
        prefix = f"{scheme}://{host}" + (f":{port}" if port else "")
        assert r["g_cut"] == prefix + r["path"], r["u"]
