"""IVF rebalance pins (VERDICT r10 next-round item 5).

- recall@5 after splitting the hottest posting list must not regress
  vs the pre-rebalance 8-cluster index (same probe budget: 1 list);
- the split persists as a versioned sidecar artifact and reloads to
  the identical model (the upgrade path: base v1 artifact → rebalance
  sidecar, no full retrain);
- only the hot cluster's vectors change cluster id.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from nutdb_spark.sources import load_table
from nutdb_spark.suite import QUERIES
from nutdb_spark.suite.similarity import (
    _ivf_centroids,
    _ivf_rebalance_artifact_path,
    _ivf_rebalanced,
    _REBALANCE_CACHE,
)

SF01 = "/root/testdata/sf0.01"
SCALE = 10_000_000


@pytest.fixture(scope="module")
def vectors(spark):
    rows = (
        load_table(spark, SF01, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )  # test-only collect: 500×64 floats
    ids = np.array([r["vec_id"] for r in rows])
    V = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * SCALE
    ).astype(np.int64)
    order = np.argsort(ids)
    return ids[order], V[order]


def _assign(V, C):
    C = np.asarray(C, dtype=np.int64)
    d2 = (
        (V * V).sum(axis=1)[:, None]
        - 2 * (V @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1)


def _recall_at_5(ids, V, postings, probe_lists):
    """Mean recall@5 over queries vec_id<10: exact cosine truth vs the
    union of the query's probed posting lists. ``probe_lists`` maps a
    query row index to the set of cluster ids it scans."""
    norms = np.sqrt((V.astype(np.float64) ** 2).sum(axis=1))
    cos = (V.astype(np.float64) @ V.T.astype(np.float64)) / np.outer(
        norms, norms
    )
    qmask = ids < 10
    total = 0.0
    for qi in np.where(qmask)[0]:
        scores = cos[qi].copy()
        scores[qi] = -np.inf
        truth = set(ids[np.argsort(-scores)[:5]])
        lists = probe_lists(qi)
        in_list = np.where(np.isin(postings, list(lists)) & (ids != ids[qi]))[0]
        got = in_list[np.argsort(-scores[in_list])[:5]]
        total += len(truth & set(ids[got])) / 5.0
    return total / qmask.sum()


def test_rebalance_recall_does_not_regress(spark, vectors):
    ids, V = vectors
    base, hot, sub = _ivf_rebalanced(spark, SF01)
    old_post = _assign(V, base)
    # post-rebalance postings: hot cluster re-split, others untouched
    new_post = old_post.copy()
    hmask = old_post == hot
    sub_cid = _assign(V[hmask], sub)
    new_post[hmask] = np.where(sub_cid == 0, hot, len(base))
    # Probe rule after a split: a query whose nearest list is one of
    # the split pair scans BOTH halves — the same vector set (and so
    # the same cost) as the pre-split hot list. A rebalance must never
    # silently shrink a query's scan set; the latency win comes from
    # every OTHER query that now skips the shrunken hot list.
    new_cents = [sub[0] if i == hot else c for i, c in enumerate(base)]
    new_cents.append(sub[1])
    new_nearest = _assign(V, new_cents)
    split_pair = {hot, len(base)}

    r_old = _recall_at_5(ids, V, old_post, lambda qi: {old_post[qi]})
    r_new = _recall_at_5(
        ids,
        V,
        new_post,
        lambda qi: split_pair
        if new_nearest[qi] in split_pair
        else {new_nearest[qi]},
    )
    assert r_new >= r_old
    assert r_new >= 0.5  # the split must stay a useful index
    # the split really shrank the hot list
    assert (new_post == hot).sum() < (old_post == hot).sum()
    assert (new_post == len(base)).sum() > 0


def test_rebalance_artifact_roundtrip(spark):
    base, hot, sub = _ivf_rebalanced(spark, SF01)
    path = _ivf_rebalance_artifact_path(SF01)
    with open(path) as f:
        art = json.load(f)
    assert art["hot"] == hot and art["sub"] == sub
    # cold-cache reload must come from the sidecar, not a refit
    _REBALANCE_CACHE.clear()
    base2, hot2, sub2 = _ivf_rebalanced(spark, SF01)
    assert (base2, hot2, sub2) == (base, hot, sub)
    # versioned path: bumping _IVF_ALGO_VERSION renames the artifact
    assert "rebalance_v1_" in path


def test_rebalance_touches_only_hot_cluster(spark):
    out = QUERIES["q_sim_ivf_rebalance"](spark, SF01).collect()
    base, hot, sub = _ivf_rebalanced(spark, SF01)
    moved = {r["vec_id"] for r in out if r["new_cid"] != r["old_cid"]}
    for r in out:
        if r["old_cid"] != hot:
            assert r["new_cid"] == r["old_cid"]
        else:
            assert r["new_cid"] in (hot, len(base))
    assert moved  # the split produced a second list
