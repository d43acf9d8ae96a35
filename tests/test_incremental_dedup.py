"""Incremental corpus-delta dedup (VERDICT r8 "Next round" #3).

Pins the replay contract: ingesting ascending-id batches through
``incremental_near_dedup`` and unioning the survivors is row-identical
to one-shot ``dedup_near_keep_first(minhash_lsh_pairs(corpus))`` — and
the design decision that makes it hold: the persisted index keeps band
rows for ALL docs, dropped ones included (a survivors-only index lets a
doc back in when its only match was itself dropped).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import (
    dedup_near_keep_first,
    incremental_near_dedup,
    minhash_band_rows,
    minhash_lsh_pairs,
)
from nutdb_spark.sources import load_table

KW = dict(n=4, num_hashes=8, bands=4, est_threshold=0.75)

# A~B and B~C at est-Jaccard exactly 0.75 but A~C only 0.5 (found by a
# deterministic search over suffix mutations of a 24-word base; the
# fixture-shape assert below guards against hash-math drift)
_A = " ".join(f"w{i}" for i in range(24))
_B = _A.replace("w19", "x9")
_C = _B.replace("w20", "y9")


def _one_shot(df):
    pairs = minhash_lsh_pairs(df, "doc_id", "text", **KW)
    return dedup_near_keep_first(pairs, df, "doc_id")


def _replay(df, splits):
    """Ingest df in ascending-id batches cut at `splits`; return the
    unioned survivors (accumulating the full band index)."""
    bounds = [float("-inf"), *splits, float("inf")]
    index = None
    survivors = None
    for lo, hi in zip(bounds, bounds[1:]):
        batch = df.filter(
            (F.col("doc_id") >= F.lit(lo)) & (F.col("doc_id") < F.lit(hi))
        )
        surv, rows = incremental_near_dedup(
            batch, index, "doc_id", "text", **KW
        )
        index = rows if index is None else index.unionByName(rows)
        survivors = surv if survivors is None else survivors.unionByName(surv)
    return survivors


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


@pytest.fixture(scope="module")
def chain(spark):
    return spark.createDataFrame(
        [(1, _A), (2, _B), (3, _C)], "doc_id int, text string"
    )


def test_chain_fixture_shape(spark, chain):
    # est(A,B) ≥ .75, est(B,C) ≥ .75, est(A,C) < .75 — the whole test
    # hinges on this shape, so assert it from the operator itself
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(chain, "doc_id", "text", **KW).collect()
    }
    assert pairs.get((1, 2), 0) >= 0.75
    assert pairs.get((2, 3), 0) >= 0.75
    assert (1, 3) not in pairs


def test_chain_drops_transitively_dropped_newcomer(spark, chain):
    # one-shot keep-first over {A,B,C} drops B (pair 1-2) AND C (pair
    # 2-3, even though 2 was itself dropped)
    assert _ids(_one_shot(chain)) == [1]
    # incremental replay: batch {A,B} then {C}. C only matches B, which
    # was dropped in batch 1 — the full index still drops C
    assert _ids(_replay(chain, [3])) == [1]


def test_survivors_only_index_would_diverge(spark, chain):
    # the counterfactual the docstring warns about: probing batch 2
    # against band rows of batch-1 SURVIVORS only readmits C
    b1 = chain.filter(F.col("doc_id") < 3)
    b2 = chain.filter(F.col("doc_id") >= 3)
    surv1, _ = incremental_near_dedup(b1, None, "doc_id", "text", **KW)
    surv_only_index = minhash_band_rows(
        surv1, "doc_id", "text", n=4, num_hashes=8, bands=4
    )
    surv2, _ = incremental_near_dedup(
        b2, surv_only_index, "doc_id", "text", **KW
    )
    assert _ids(surv2) == [3]  # ≠ one-shot, which drops 3


def test_replay_matches_one_shot_on_documents(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    want = _ids(_one_shot(d))
    assert _ids(_replay(d, [250])) == want          # two batches
    assert _ids(_replay(d, [120, 260, 400])) == want  # four batches


def test_first_batch_and_empty_delta(spark, chain):
    surv, rows = incremental_near_dedup(
        chain.filter("doc_id <= 1"), None, "doc_id", "text", **KW
    )
    assert _ids(surv) == [1]
    empty = chain.filter("doc_id > 99")
    surv2, rows2 = incremental_near_dedup(
        empty, rows, "doc_id", "text", **KW
    )
    assert surv2.count() == 0 and rows2.count() == 0


def test_partition_independence(spark, chain):
    skewed = chain.repartition(7)
    assert _ids(_replay(skewed, [3])) == [1]


# --- incremental EXACT dedup (transitive key; survivors-only index) --------


def test_incremental_exact_cross_batch_hits(spark):
    """The sf0.01 documents fixture has ZERO exact content duplicates,
    so the graded entry never exercises an index HIT — pin the hit
    path (and the within-delta keep-first) on synthetic clones."""
    from nutdb_spark.operators.dedup import incremental_exact_dedup
    from nutdb_spark.operators.text import fingerprint_md5

    df = spark.createDataFrame(
        [
            (1, "alpha"), (2, "beta"), (3, "alpha"),   # batch 1
            (4, "alpha"), (5, "gamma"), (6, "gamma"),  # batch 2
        ],
        "doc_id int, text string",
    )
    key = fingerprint_md5(F.col("text"))
    b1 = df.filter("doc_id <= 3")
    b2 = df.filter("doc_id > 3")
    surv1, keys1 = incremental_exact_dedup(b1, None, "doc_id", key)
    assert _ids(surv1) == [1, 2]          # 3 dropped within batch 1
    assert keys1.count() == 2             # survivors' keys only
    surv2, keys2 = incremental_exact_dedup(b2, keys1, "doc_id", key)
    assert _ids(surv2) == [5]             # 4 hits index; 6 loses to 5
    assert keys2.count() == 1
    # replay == one-shot keep-min-per-key
    one_shot = (
        df.withColumn("__k", key)
        .groupBy("__k").agg(F.min("doc_id").alias("doc_id"))
    )
    assert sorted(r["doc_id"] for r in one_shot.collect()) == [1, 2, 5]


def test_incremental_exact_three_batch_replay(spark, sf_dir):
    from nutdb_spark.operators.dedup import incremental_exact_dedup
    from nutdb_spark.operators.text import fingerprint_md5

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    key = fingerprint_md5(F.col("text"))
    want = sorted(
        r["doc_id"]
        for r in d.withColumn("__k", key)
        .groupBy("__k").agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    index, got = None, []
    for lo, hi in ((0, 150), (150, 320), (320, 10**9)):
        b = d.filter(
            (F.col("doc_id") >= F.lit(lo)) & (F.col("doc_id") < F.lit(hi))
        )
        surv, keys = incremental_exact_dedup(b, index, "doc_id", key)
        got.extend(_ids(surv))
        index = keys if index is None else index.unionByName(keys).distinct()
    assert sorted(got) == want


# --- incremental connected components (r11) ---------------------------------


def _labels(df):
    return {r["id"]: r["root"] for r in df.collect()}


def test_incremental_connected_untouched_component_not_recomputed(spark):
    from nutdb_spark.operators.dedup import incremental_connected

    p1 = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    l1 = incremental_connected(p1, None)
    assert _labels(l1) == {1: 1, 2: 1, 5: 5, 6: 5}
    # batch 2 touches only component {1,2}: the fixpoint must see the
    # contracted edge (1, 10) and NOTHING of component {5,6}
    p2 = spark.createDataFrame([(2, 10)], "id_a long, id_b long")
    stats = {}
    l2 = incremental_connected(p2, l1, stats=stats)
    assert _labels(l2) == {1: 1, 2: 1, 10: 1, 5: 5, 6: 5}
    assert stats["fixpoint_nodes"] == 2  # {1, 10} only — 5/6 untouched


def test_incremental_connected_merges_existing_components(spark):
    from nutdb_spark.operators.dedup import incremental_connected

    p1 = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    l1 = incremental_connected(p1, None)
    # one delta edge bridges the two stored components: both re-root
    # to the global min through the contracted edge (1, 5)
    p2 = spark.createDataFrame([(2, 6)], "id_a long, id_b long")
    stats = {}
    l2 = incremental_connected(p2, l1, stats=stats)
    assert _labels(l2) == {1: 1, 2: 1, 5: 1, 6: 1}
    assert stats["fixpoint_nodes"] == 2  # the two old roots only


def test_incremental_connected_replay_matches_one_shot(spark, sf_dir):
    from nutdb_spark.operators.dedup import (
        connected_components,
        incremental_connected,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    one_shot = connected_components(
        minhash_lsh_pairs(
            d, "doc_id", "text",
            n=4, num_hashes=8, bands=4, est_threshold=0.75,
        )
    )
    kw = dict(n=4, num_hashes=8, bands=4, est_threshold=0.75)
    index, labels = None, None
    for lo, hi in ((0, 20), (20, 35), (35, 10**9)):
        b = d.filter(
            (F.col("doc_id") >= F.lit(lo)) & (F.col("doc_id") < F.lit(hi))
        )
        pairs, rows = incremental_lsh_pairs(b, index, "doc_id", "text", **kw)
        labels = incremental_connected(pairs, labels)
        labels = labels.localCheckpoint()
        index = rows if index is None else index.unionByName(rows)
        index = index.localCheckpoint()
    assert _labels(labels) == _labels(one_shot)


def test_streaming_neardup_equals_one_shot(spark):
    """q_stream_dedup_neardup (foreachBatch band-index growth) must be
    row-identical to the one-shot LSH dedup over the whole corpus —
    the stream ≡ batch replay contract, here at sf0.001."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.dedup import (
        dedup_near_keep_first,
        minhash_lsh_pairs,
    )
    from nutdb_spark.sources import load_table
    from nutdb_spark.suite import QUERIES

    sf = "/root/testdata/sf0.001"
    streamed = {
        tuple(r)
        for r in QUERIES["q_stream_dedup_neardup"](spark, sf).collect()
    }
    d = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", n=4, num_hashes=8, bands=4,
        est_threshold=0.75,
    )
    oneshot = {
        tuple(r)
        for r in dedup_near_keep_first(
            pairs, d.select("doc_id", "lang"), "doc_id"
        ).collect()
    }
    assert streamed == oneshot and len(oneshot) > 0
