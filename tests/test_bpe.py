"""BPE tokenization armor (operators/bpe.py).

The oracled entries (sql_fn_bpe, q_text_bpe, q_pack_bpe) pin the
DuckDB bit-identity at sf0.01; these pin the VALUES against an
independent Python reference (including the textbook min-rank-pair
iteration, proving the rank-order fold is the same algorithm), the
trainer's determinism, the scale-path/direct-path agreement, and the
zero-Python-UDF plan.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.bpe import (
    BPE_MERGES,
    bpe_token_count_text,
    bpe_token_counts,
    bpe_tokens_text,
    bpe_word_tokens,
)

_WORD_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


def _encode_word_rank_order(w: str) -> list[str]:
    toks = list(w)
    for a, b in BPE_MERGES:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _encode_word_min_rank(w: str) -> list[str]:
    """Textbook BPE application: repeatedly merge ALL occurrences of
    the lowest-rank pair present."""
    rank = {p: i for i, p in enumerate(BPE_MERGES)}
    toks = list(w)
    while True:
        best, best_r = None, None
        for p in zip(toks, toks[1:]):
            r = rank.get(p)
            if r is not None and (best_r is None or r < best_r):
                best, best_r = p, r
        if best is None:
            return toks
        a, b = best
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def _encode_text(t: str) -> list[str]:
    return [
        tok
        for w in _WORD_RE.findall(t.lower())
        for tok in _encode_word_rank_order(w)
    ]


def test_rank_order_equals_min_rank_iteration():
    """The Spark fold applies merges in rank order; the textbook
    algorithm picks the min-rank pair present each step. Equivalent
    for trained tables (a rule mentioning a merged token always ranks
    later) — proven here over random words AND every vocab token."""
    rnd = random.Random(48)
    alphabet = "aberoswtcjlmnfgpduvhix0159"
    words = ["".join(rnd.choices(alphabet, k=rnd.randint(1, 14)))
             for _ in range(300)]
    words += [a + b for a, b in BPE_MERGES]
    words += ["order", "vector", "customer", "joinjoin", "scanscan"]
    for w in words:
        assert _encode_word_rank_order(w) == _encode_word_min_rank(w), w


def test_trained_table_rule_parts_rank_earlier():
    """The soundness precondition of rank-order application, pinned
    structurally: every multi-char part of rule r was built by an
    earlier rule."""
    built = set()
    for a, b in BPE_MERGES:
        for part in (a, b):
            if len(part) > 1:
                assert part in built, (a, b)
        built.add(a + b)


def test_spark_fold_matches_python_reference(spark):
    rnd = random.Random(1207)
    alphabet = "aberoswtcjlmnfgpduvhix0159 -.!"
    texts = [
        "",
        "   ",
        "Order-77!",
        "the quick brown fox JUMPS over 13 lazy dogs",
        "aaaa ssss orderorder vvector",
    ] + [
        "".join(rnd.choices(alphabet, k=rnd.randint(0, 60)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        bpe_tokens_text(F.col("t")).alias("toks"),
        bpe_token_count_text(F.col("t")).alias("n"),
    ).collect()
    for t, r in zip(texts, got):
        want = _encode_text(t)
        assert r["toks"] == want, repr(t)
        assert r["n"] == len(want), repr(t)


def test_greedy_left_to_right_runs(spark):
    """'aaa' under an ('a','a') rule must give ['aa','a'] — greedy
    left-to-right, matching the trainer's simultaneous replacement."""
    merges = (("a", "a"),)
    df = spark.createDataFrame([("aaa",), ("aaaa",)], "w string")
    got = df.select(bpe_word_tokens(F.col("w"), merges).alias("t")).collect()
    assert got[0]["t"] == ["aa", "a"]
    assert got[1]["t"] == ["aa", "aa"]


def test_scale_path_agrees_with_direct_fold(spark):
    """bpe_token_counts (distinct-word join — the 100 TB shape) must
    equal the direct per-row fold, including empty/whitespace docs."""
    texts = [
        (0, "order vector batch"),
        (1, ""),
        (2, "   "),
        (3, "Order-0! mixed CASE and 99 numbers"),
        (4, "join join join"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    scale = {
        r["key"]: r["bpe_tokens"]
        for r in bpe_token_counts(
            df, F.col("doc_id"), F.col("text")
        ).collect()
    }
    direct = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_text(F.col("text")).alias("n")
        ).collect()
    }
    assert scale == direct
    assert scale[1] == 0 and scale[2] == 0


def test_trainer_is_deterministic_and_reproduces_prefix():
    """tools/train_bpe.py on the same corpus reproduces the committed
    table prefix (the committed vocab was trained on sf0.01 documents;
    here a fixed mini-corpus pins the trainer's tie-breaking)."""
    import sys

    sys.path.insert(0, "tools")
    from train_bpe import train

    corpus = ["order order vector", "vector batch order", "scan scan"]
    m1 = train(corpus, 10)
    m2 = train(corpus, 10)
    assert m1 == m2
    assert m1[0] == ("o", "r")  # most frequent pair, asc tie-break
    # and the committed table is what the trainer emits on the fixture
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' "
            "ORDER BY doc_id"
        ).fetchall()
    ]
    assert tuple(train(texts, len(BPE_MERGES))) == BPE_MERGES


def test_no_python_nodes_in_bpe_plans(spark):
    from nutdb_spark.suite import QUERIES

    for name in (
        "q_text_bpe",
        "q_pack_bpe",
        "sql_fn_bpe",
        "q_pack_emit",
        "q_text_token_ids",
    ):
        plan = (
            QUERIES[name](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in plan, name


def test_token_ids_are_dense_vocabulary_ids(spark):
    """q_text_token_ids assigns dense 0..V-1 ids (lexicographic token
    order) and decoding every emitted id through the vocab reproduces
    the string token stream of the join encoder."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.bpe import bpe_tokens_by_join
    from nutdb_spark.sources import load_table
    from nutdb_spark.suite import QUERIES

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    toks = {
        r["key"]: r["toks"]
        for r in bpe_tokens_by_join(
            d, F.col("doc_id"), F.col("text")
        ).collect()
    }
    vocab = sorted({t for ts in toks.values() for t in ts})
    ids = {t: i for i, t in enumerate(vocab)}
    got = QUERIES["q_text_token_ids"](spark, sf).collect()
    assert len(got) == len(toks)
    for r in got:
        want = toks[r["doc_id"]]
        assert r["n_tokens"] == len(want)
        emitted = [] if r["ids"] == "" else [
            int(x) for x in r["ids"].split(" ")
        ]
        assert [vocab[i] for i in emitted] == want
        assert all(0 <= i < len(vocab) for i in emitted)
    assert ids == {t: i for i, t in enumerate(vocab)}


def test_join_encoder_agrees_with_direct_fold(spark):
    """bpe_tokens_by_join (the 100 TB emit shape) must reproduce the
    direct per-row fold's FULL token arrays — including empty docs,
    repeated words, and punctuation-only rows — on randomized text."""
    import random

    from nutdb_spark.operators.bpe import bpe_tokens_by_join

    rnd = random.Random(1213)
    alphabet = "aberoswtcjlmn 0159-.!"
    texts = [
        (0, ""),
        (1, "   "),
        (2, "join join join"),
        (3, "Order-77! vector"),
    ] + [
        (i, "".join(rnd.choices(alphabet, k=rnd.randint(0, 80))))
        for i in range(4, 40)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    joined = {
        r["key"]: r["toks"]
        for r in bpe_tokens_by_join(
            df, F.col("doc_id"), F.col("text")
        ).collect()
    }
    direct = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", bpe_tokens_text(F.col("text")).alias("t")
        ).collect()
    }
    assert joined == direct
    assert joined[0] == [] and joined[1] == []


# --- distributed TRAINING (bpe_train) ---------------------------------------


def _script_train(texts, n):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from train_bpe import train

    return train(texts, n)


def test_train_reproduces_committed_prefix(spark):
    from nutdb_spark.operators.bpe import BPE_MERGES, bpe_train

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    learned = bpe_train(d, F.col("text"), 6)
    assert [(a, b) for a, b, _ in learned] == list(BPE_MERGES[:6])
    assert all(c > 0 for _, _, c in learned)


def test_train_matches_reference_trainer_on_random_corpus(spark):
    import random

    from nutdb_spark.operators.bpe import bpe_train

    rng = random.Random(7)
    vocab = ["spark", "sparse", "parse", "apse", "spa", "a1b2", "x#y"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(a, b) for a, b, _ in bpe_train(df, F.col("text"), 10)]
    want = _script_train(texts, 10)
    assert got == want


def test_train_warm_start_continues_the_table(spark):
    from nutdb_spark.operators.bpe import BPE_MERGES, bpe_train

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    cont = bpe_train(
        d, F.col("text"), 3, merges_prefix=tuple(BPE_MERGES[:3])
    )
    assert [(a, b) for a, b, _ in cont] == list(BPE_MERGES[3:6])


def test_train_exhausts_gracefully(spark):
    from nutdb_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([("a a a",), ("a",)], "text string")
    # single-char words only: zero pairs, training stops immediately
    assert bpe_train(df, F.col("text"), 5) == []


def test_bpe_decode_round_trip_holds(spark):
    """q_text_bpe_decode's oracle pins cross-engine agreement; the
    round-trip CLAIM (ok on every row — bijective id map,
    order-preserving assembly) is pinned here."""
    from nutdb_spark.suite import QUERIES

    rows = QUERIES["q_text_bpe_decode"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    assert all(r["ok"] for r in rows)
    assert any(r["n_tokens"] > 0 for r in rows)
