"""tier-11 string-similarity family: randomized armor against plain
python reference implementations (OSA Damerau-Levenshtein, textbook
Jaro/Jaro-Winkler with floored transpositions and the 0.7 boost
threshold, byte Hamming with length tail), plus the edge cases that
bit the fold lowerings (empty strings, equal strings, window-0 pairs,
adjacent transpositions chained past OSA's one-edit-per-substring).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import SCALAR_FNS


def py_osa(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = 1 << 40
    pp = [inf] * (lb + 1)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        new = [i]
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, new[j - 1] + 1, prev[j - 1] + cost)
            if (
                i >= 2
                and j >= 2
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, pp[j - 2] + 1)
            new.append(v)
        pp, prev = prev, new
    return prev[lb]


def py_jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    w = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    ma, mb = [], []
    for i in range(la):
        for j in range(max(0, i - w), min(lb - 1, i + w) + 1):
            if not used[j] and b[j] == a[i]:
                used[j] = True
                ma.append(a[i])
                mb.append(j)
                break
    m = len(ma)
    if m == 0:
        return 0.0
    bs = [b[j] for j in sorted(mb)]
    t = sum(1 for x, y in zip(ma, bs) if x != y) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def py_jw(a: str, b: str) -> float:
    j = py_jaro(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def py_bh(a: str, b: str) -> int:
    lo = min(len(a), len(b))
    return sum(1 for i in range(lo) if a[i] != b[i]) + abs(len(a) - len(b))


EDGES = [
    ("", ""), ("", "abc"), ("abc", ""), ("a", "a"),
    ("ab", "ba"), ("abc", "acb"), ("ca", "abc"),  # OSA 3, full DL 2
    ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
    ("aggregate", "agreggate"),  # odd mismatch count → floored t
    ("abcdxxxx", "abcdyyyy"),  # prefix but below boost threshold
    ("xxxxabc", "abcxxxx"),
]


@pytest.fixture(scope="module")
def pairs():
    rng = random.Random(42)
    ws = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 9)))
        for _ in range(120)
    ]
    return EDGES + [(rng.choice(ws), rng.choice(ws)) for _ in range(120)]


def test_strsim_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        SCALAR_FNS["damerauLevenshteinDistance"](
            F.col("a"), F.col("b")
        ).alias("dl"),
        SCALAR_FNS["jaroSimilarity"](F.col("a"), F.col("b")).alias("j"),
        SCALAR_FNS["jaroWinklerSimilarity"](F.col("a"), F.col("b")).alias(
            "jw"
        ),
        SCALAR_FNS["byteHammingDistance"](F.col("a"), F.col("b")).alias(
            "bh"
        ),
    ).collect()
    for r in rows:
        a, b = r["a"], r["b"]
        assert r["dl"] == py_osa(a, b), (a, b)
        assert r["j"] == pytest.approx(py_jaro(a, b), abs=0), (a, b)
        assert r["jw"] == pytest.approx(py_jw(a, b), abs=0), (a, b)
        assert r["bh"] == py_bh(a, b), (a, b)


def test_strsim_null_propagates(spark):
    df = spark.createDataFrame([("abc", None)], "a string, b string")
    r = df.select(
        SCALAR_FNS["damerauLevenshteinDistance"](
            F.col("a"), F.col("b")
        ).alias("dl"),
        SCALAR_FNS["jaroSimilarity"](F.col("a"), F.col("b")).alias("j"),
        SCALAR_FNS["jaroWinklerSimilarity"](F.col("a"), F.col("b")).alias(
            "jw"
        ),
        SCALAR_FNS["byteHammingDistance"](F.col("a"), F.col("b")).alias(
            "bh"
        ),
    ).first()
    assert r["dl"] is None and r["j"] is None
    assert r["jw"] is None and r["bh"] is None


def py_lev(a, b):
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        new = [i]
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            new.append(min(prev[j] + 1, new[j - 1] + 1, prev[j - 1] + cost))
        prev = new
    return prev[lb]


def test_array_levenshtein_matches_reference(spark):
    rng = random.Random(13)
    rows = [
        (
            [rng.randint(0, 4) for _ in range(rng.randint(0, 8))],
            [rng.randint(0, 4) for _ in range(rng.randint(0, 8))],
        )
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "a array<long>, b array<long>")
    got = df.select(
        "a",
        "b",
        SCALAR_FNS["arrayLevenshtein"](F.col("a"), F.col("b")).alias("d"),
    ).collect()
    for r in got:
        assert r["d"] == py_lev(r["a"], r["b"]), (r["a"], r["b"])
    # OSA damerau over strings is always <= plain lev over their chars
    pairs = [("ab", "ba"), ("spark", "sprak"), ("abc", "cab")]
    df2 = spark.createDataFrame(pairs, "x string, y string")
    rows2 = df2.select(
        "x",
        "y",
        SCALAR_FNS["damerauLevenshteinDistance"](
            F.col("x"), F.col("y")
        ).alias("dl"),
    ).collect()
    for r in rows2:
        assert r["dl"] <= py_lev(r["x"], r["y"])
