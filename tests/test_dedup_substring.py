"""Sliding-k-gram exact-substring dedup armor
(operators/dedup.py dedup_repeated_ngrams).

The oracled entry (q_dedup_substring) pins DuckDB bit-identity; these
pin the semantics against an independent Python replay — crafted
shift-offset duplicates (the case the aligned-chunk dedup_spans
cannot catch) plus a randomized small corpus — and the fixture
removal rate being real.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import dedup_repeated_ngrams


def _py_replay(texts: dict[int, str], k: int, max_freq: int) -> dict:
    toks = {
        i: [w for w in re.split(r"\s+", t.strip()) if w]
        for i, t in texts.items()
    }
    freq: dict[str, int] = {}
    for ws in toks.values():
        for s in range(len(ws) - k + 1):
            g = " ".join(ws[s : s + k])
            freq[g] = freq.get(g, 0) + 1
    out = {}
    for i, ws in toks.items():
        covered = set()
        for s in range(len(ws) - k + 1):
            if freq[" ".join(ws[s : s + k])] > max_freq:
                covered.update(range(s, s + k))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def _run(spark, texts: dict[int, str], k: int = 4, max_freq: int = 1):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = dedup_repeated_ngrams(
        df, "doc_id", "text", k=k, max_freq=max_freq
    ).collect()
    got = {r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"]) for r in rows}
    assert got == _py_replay(texts, k, max_freq)
    return got


def test_shift_offset_duplicate_is_caught(spark):
    # the same 6-word passage at offsets 0 and 3 — disjoint 10-token
    # chunking would never align them; sliding 4-grams must.
    passage = "alpha beta gamma delta epsilon zeta"
    texts = {
        0: passage + " tail one two",
        1: "pre one two " + passage,
        2: "totally unrelated words here nothing shared at all",
    }
    got = _run(spark, texts, k=4)
    assert got[0][1] >= 6 and got[1][1] >= 6
    assert got[2][1] == 0


def test_fully_covered_doc_surfaces_empty(spark):
    t = "one two three four"
    got = _run(spark, {0: t, 1: t}, k=4)
    assert got[0] == (4, 4, "") and got[1] == (4, 4, "")


def test_short_and_empty_docs(spark):
    got = _run(spark, {0: "a b", 1: "", 2: "   "}, k=4)
    assert got[0] == (2, 0, "a b")
    assert got[1] == (0, 0, "") and got[2] == (0, 0, "")


def test_randomized_corpus_matches_replay(spark):
    rng = random.Random(12012)
    vocab = [f"w{j}" for j in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for i in range(40)
    }
    # plant a shared passage in a third of the docs at random offsets
    passage = "p1 p2 p3 p4 p5 p6"
    for i in range(0, 40, 3):
        ws = texts[i].split()
        at = rng.randint(0, len(ws))
        texts[i] = " ".join(ws[:at] + passage.split() + ws[at:])
    _run(spark, texts, k=4)
    _run(spark, texts, k=5, max_freq=2)


def test_fixture_removal_rate_is_real(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = (
        dedup_repeated_ngrams(d, "doc_id", "text", k=8, max_freq=1)
        .agg(
            F.sum("n_removed").alias("rm"),
            F.sum("n_words").alias("tot"),
        )
        .collect()[0]
    )
    assert 0 < agg["rm"] < agg["tot"]


# --- incremental (corpus-delta) form ----------------------------------------


def _one_shot(spark, texts: dict[int, str], k: int = 4):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"])
        for r in dedup_repeated_ngrams(df, "doc_id", "text", k=k).collect()
    }


def _replay(spark, batches: list[dict[int, str]], k: int = 4):
    from nutdb_spark.operators.dedup import incremental_repeated_ngrams

    idx = None
    merged: dict[int, tuple] = {}
    for b in batches:
        df = spark.createDataFrame(
            [(i, t) for i, t in b.items()], "doc_id long, text string"
        )
        cleaned, occ, docs, cnt = incremental_repeated_ngrams(
            df, idx, "doc_id", "text", k=k
        )
        rows = {
            r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"])
            for r in cleaned.collect()
        }
        merged.update(rows)  # later batches override (revisions)
        # materialize state like the persisted-parquet entry does
        occ, docs, cnt = occ.localCheckpoint(), docs.localCheckpoint(), cnt.localCheckpoint()
        idx = (occ, docs, cnt)
    return merged


def test_incremental_revises_old_doc_on_flip(spark):
    passage = "alpha beta gamma delta"
    b1 = {0: passage + " solo tail", 1: "unrelated words entirely here"}
    b2 = {2: "prefix bit " + passage}
    got = _replay(spark, [b1, b2], k=4)
    want = _one_shot(spark, {**b1, **b2}, k=4)
    assert got == want
    assert want[0][1] >= 4  # the batch-1 doc WAS revised (flip)


def test_incremental_randomized_three_batch_replay(spark):
    import random

    rng = random.Random(20260816)
    vocab = [f"t{j}" for j in range(10)]
    docs = {}
    for i in range(36):
        docs[i] = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(0, 24))
        )
    passage = "s1 s2 s3 s4 s5"
    for i in (2, 14, 25, 33):  # straddles every batch boundary
        ws = docs[i].split()
        at = rng.randint(0, len(ws))
        docs[i] = " ".join(ws[:at] + passage.split() + ws[at:])
    batches = [
        {i: t for i, t in docs.items() if i < 12},
        {i: t for i, t in docs.items() if 12 <= i < 24},
        {i: t for i, t in docs.items() if i >= 24},
    ]
    assert _replay(spark, batches, k=4) == _one_shot(spark, docs, k=4)


def test_inplace_revision_replaces_stored_doc(spark):
    """Re-ingesting an existing doc_id (no delete first) must act as
    an in-place revision: old state purged, counts decremented, and a
    revision that removes the shared passage UNCOVERS the partner."""
    passage = "p1 p2 p3 p4 p5"
    b1 = {0: passage + " x y", 1: "a b " + passage}
    rev = {0: "totally different words now z"}
    got = _replay(spark, [b1, rev], k=4)
    want = _one_shot(spark, {**b1, **rev}, k=4)
    assert got == want
    # the partner regained its words (the shared gram dropped to 1)
    assert got[1][1] == 0 and got[1][2] == b1[1]


def test_inplace_revision_state_has_no_duplicates(spark):
    passage = "p1 p2 p3 p4 p5"
    texts = {0: passage + " x y", 1: "a b " + passage}
    from nutdb_spark.operators.dedup import incremental_repeated_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    _, occ, docs, cnt = incremental_repeated_ngrams(
        df, None, "doc_id", "text", k=4
    )
    st = (occ.localCheckpoint(), docs.localCheckpoint(), cnt.localCheckpoint())
    # re-ingest doc 0 with IDENTICAL text — state must be unchanged,
    # not double-counted
    re0 = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    _, occ2, docs2, cnt2 = incremental_repeated_ngrams(
        re0, st, "doc_id", "text", k=4
    )
    assert docs2.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert occ2.count() == st[0].count()
    before = {r["gram"]: r["cnt"] for r in st[2].collect()}
    after = {r["gram"]: r["cnt"] for r in cnt2.collect()}
    assert before == after


def test_incremental_randomized_with_revisions_replay(spark):
    """Randomized multi-batch ingest where later batches REVISE doc_ids
    from earlier batches — replay must equal the one-shot run on the
    final (post-revision) corpus."""
    import random

    rng = random.Random(20260817)
    vocab = [f"t{j}" for j in range(10)]
    passage = "s1 s2 s3 s4 s5"

    def mk():
        ws = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        if rng.random() < 0.4:
            at = rng.randint(0, len(ws))
            ws = ws[:at] + passage.split() + ws[at:]
        return " ".join(ws)

    b1 = {i: mk() for i in range(12)}
    b2 = {i: mk() for i in range(8, 20)}   # 8-11 revise batch-1 docs
    b3 = {i: mk() for i in range(2, 6)}    # revise batch-1 docs again
    final = {**b1, **b2, **b3}
    assert _replay(spark, [b1, b2, b3], k=4) == _one_shot(spark, final, k=4)


def test_delete_pass_uncovers_partner(spark):
    from nutdb_spark.operators.dedup import delete_repeated_ngrams

    passage = "alpha beta gamma delta"
    texts = {0: passage + " tail one", 1: "pre " + passage, 2: "other words"}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    from nutdb_spark.operators.dedup import incremental_repeated_ngrams

    c1, occ, docs, cnt = incremental_repeated_ngrams(
        df, None, "doc_id", "text", k=4
    )
    occ, docs, cnt = (
        occ.localCheckpoint(), docs.localCheckpoint(), cnt.localCheckpoint()
    )
    before = {r["doc_id"]: r for r in c1.collect()}
    assert before[1]["n_removed"] >= 4  # covered while doc 0 lives
    dels = spark.createDataFrame([(0,)], "doc_id long")
    c2, occ2, docs2, cnt2 = delete_repeated_ngrams(
        dels, (occ, docs, cnt), k=4, max_freq=1
    )
    got = {r["doc_id"]: r for r in c2.collect()}
    # the surviving partner re-emits, fully restored
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == texts[1]
    # and the state is purged for real
    assert occ2.filter("doc_id = 0").count() == 0
    assert docs2.filter("doc_id = 0").count() == 0
    # deleted contributions left the counts (the shared gram is gone
    # or decremented below the threshold everywhere)
    assert cnt2.filter("cnt > 1").count() == 0


def test_delete_then_reingest_round_trip(spark):
    """Forget one member of a pair, then re-ingest it: the flip and
    the uncover must be exact inverses through the persisted state."""
    from nutdb_spark.operators.dedup import (
        delete_repeated_ngrams,
        incremental_repeated_ngrams,
    )

    passage = "p1 p2 p3 p4 p5"
    texts = {0: passage + " x y", 1: "a b " + passage}

    def ck(t3):
        return tuple(x.localCheckpoint() for x in t3)

    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    c1, *st = incremental_repeated_ngrams(df, None, "doc_id", "text", k=4)
    st = ck(st)
    dels = spark.createDataFrame([(0,)], "doc_id long")
    c2, *st = delete_repeated_ngrams(dels, tuple(st), k=4, max_freq=1)
    st = ck(st)
    re0 = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    c3, *st = incremental_repeated_ngrams(
        re0, tuple(st), "doc_id", "text", k=4
    )
    final = {r["doc_id"]: (r["n_removed"], r["clean_text"]) for r in c3.collect()}
    orig = {r["doc_id"]: (r["n_removed"], r["clean_text"]) for r in c1.collect()}
    assert final == orig  # both docs re-covered exactly as at first
