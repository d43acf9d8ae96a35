"""Connected-components near-dup (transitive groups)."""

from __future__ import annotations


def test_three_chain_keeps_exactly_one(spark):
    from nutdb_spark.operators.dedup import (
        dedup_connected_keep_min,
        dedup_near_keep_first,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], "doc_id long"
    )
    kept = {r["doc_id"] for r in
            dedup_connected_keep_min(pairs, docs, "doc_id").collect()}
    assert kept == {1, 9}  # the whole chain collapses to its min
    # contrast: single-sweep keep-first under-merges the chain
    sweep = {r["doc_id"] for r in
             dedup_near_keep_first(pairs, docs, "doc_id").collect()}
    assert sweep == {1, 9}  # here B,C both drop (both appear as id_b)


def test_components_roots_and_long_chain(spark):
    from nutdb_spark.operators.dedup import connected_components

    # two components: a 6-chain (diameter > 2 needs iteration) + a pair
    chain = [(i, i + 1) for i in range(10, 15)]
    pairs = spark.createDataFrame(
        chain + [(100, 101)], "id_a long, id_b long"
    )
    comp = {(r["id"], r["root"]) for r in
            connected_components(pairs).collect()}
    assert comp == {(i, 10) for i in range(10, 16)} | {
        (100, 100), (101, 100),
    }


def test_cross_pair_merges_components(spark):
    from nutdb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 4)], "id_a long, id_b long"
    )
    roots = {r["root"] for r in connected_components(pairs).collect()}
    assert roots == {1}


def test_two_phase_matches_label_and_halves_rounds(spark):
    """Alternating large-star/small-star must produce the identical
    component labels AND converge in fewer rounds than min-label
    propagation on a deep chain (label prop spreads the min one hop
    per round; the star alternation contracts in O(log n))."""
    from nutdb_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 25)]  # 25-node path
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    s_label: dict = {}
    s_star: dict = {}
    lab = {(r["id"], r["root"]) for r in connected_components(
        pairs, max_iters=40, stats=s_label).collect()}
    star = {(r["id"], r["root"]) for r in connected_components(
        pairs, max_iters=40, algorithm="two_phase", stats=s_star).collect()}
    assert lab == star == {(i, 1) for i in range(1, 26)}
    assert s_star["rounds"] < s_label["rounds"]


def test_two_phase_multi_component(spark):
    from nutdb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 4), (7, 8), (9, 9)],
        "id_a long, id_b long",
    )
    comp = {(r["id"], r["root"]) for r in connected_components(
        pairs, algorithm="two_phase").collect()}
    # self-loop (9,9) contributes no edge; 9 is not in any pair output
    assert comp == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (8, 7)}


def test_two_phase_equals_label_on_random_graphs(spark):
    """Both algorithms must produce identical component labels on
    random small graphs (including self-loops, parallel edges, and
    disconnected singleton pairs)."""
    import random

    from nutdb_spark.operators.dedup import connected_components

    rng = random.Random(20260814)
    for trial in range(4):
        n_nodes = rng.randint(4, 14)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(2, 18))
        ]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        lab = {(r["id"], r["root"]) for r in connected_components(
            pairs, max_iters=40).collect()}
        star = {(r["id"], r["root"]) for r in connected_components(
            pairs, max_iters=40, algorithm="two_phase").collect()}
        # label prop includes self-loop-only nodes; two_phase drops
        # edges (x, x) before anything else — compare on shared ids
        star_ids = {i for i, _ in star}
        lab_shared = {(i, r) for i, r in lab if i in star_ids}
        assert star == lab_shared, (trial, edges)


def test_keep_best_prefers_high_score_then_min_id(spark):
    from nutdb_spark.operators.dedup import dedup_connected_keep_best

    # component {1,2,3} (chain), singleton {9}; best score in the
    # middle of the chain — keep-min would keep 1, keep-best keeps 2.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 10), (9, 1)], "doc_id long, sc long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_connected_keep_best(pairs, docs, "doc_id", "sc").collect()
    )
    assert kept == [2, 9]

    # tie on score -> min id wins
    docs2 = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5), (9, 1)], "doc_id long, sc long"
    )
    kept2 = sorted(
        r["doc_id"]
        for r in dedup_connected_keep_best(pairs, docs2, "doc_id", "sc").collect()
    )
    assert kept2 == [1, 9]
