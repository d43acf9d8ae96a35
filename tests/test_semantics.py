"""Operator semantics edge cases no SQL-oracle suite entry reaches.

The correctness gate compares full queries against DuckDB on fixture
data; these tests pin down the degenerate inputs the fixtures never
produce (empty subqueries, all-NULL sets) where SQL three-valued logic
is easiest to get wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _ids(df):
    return sorted(
        (r[0] for r in df.select(df.columns[0]).collect()),
        key=lambda v: (v is not None, v),
    )


def test_not_in_empty_subquery_keeps_all_rows(spark):
    """x NOT IN (empty set) is TRUE for every x — including NULL.
    (ADVICE r1: the old lowering dropped NULL probe rows here.)"""
    from nutdb_spark.operators.relational import not_in_subquery

    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    empty = spark.createDataFrame([], "v int")
    assert _ids(not_in_subquery(df, "x", empty)) == [None, 1, 2]
    # and the non-null rows survive a set that never matches
    assert _ids(not_in_subquery(df, "x", spark.createDataFrame([(9,)], "v int"))) == [1, 2]


def test_not_in_set_with_null_keeps_nothing(spark):
    """Any NULL in the set makes NOT IN never-TRUE for every probe."""
    from nutdb_spark.operators.relational import not_in_subquery

    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    sub = spark.createDataFrame([(9,), (None,)], "v int")
    assert _ids(not_in_subquery(df, "x", sub)) == []


def test_not_in_plain_set_drops_matches_and_null_probe(spark):
    """NULL probe vs non-empty NULL-free set → UNKNOWN → dropped;
    matches dropped; the rest kept. Duplicates in the set must not
    duplicate output rows."""
    from nutdb_spark.operators.relational import not_in_subquery

    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "x int")
    sub = spark.createDataFrame([(2,), (2,), (9,)], "v int")
    assert _ids(not_in_subquery(df, "x", sub)) == [1, 3]


def test_in_subquery_null_probe_dropped(spark):
    """IN is never TRUE for a NULL probe; duplicates in the set must
    not duplicate output rows."""
    from nutdb_spark.operators.relational import in_subquery

    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    sub = spark.createDataFrame([(2,), (2,), (None,)], "v int")
    assert _ids(in_subquery(df, "x", sub)) == [2]


def test_limit_with_ties_keeps_tying_rows(spark):
    from nutdb_spark.operators.relational import limit_with_ties

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    out = limit_with_ties(df, [("k", True)], 2)
    assert sorted(r.v for r in out.collect()) == ["a", "b", "c"]


def test_asof_join_empty_right_gives_null_payload(spark):
    from nutdb_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (2, 20)], "k int, ts int")
    right = spark.createDataFrame([], "k int, ts int, v int")
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["v"]
    ).collect()
    assert len(rows) == 2 and all(r["asof_v"] is None for r in rows)


def test_jaccard_short_docs_produce_no_rows(spark):
    from nutdb_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "one two")], "doc_id long, text string"
    )
    # 4-grams need >= 4 tokens; neither doc qualifies
    assert jaccard_pairs(docs, "doc_id", "text", n=4, threshold=0.0).count() == 0


def test_simhash_empty_and_identical_docs(spark):
    from nutdb_spark.operators.dedup import simhash_df

    docs = spark.createDataFrame(
        [(1, ""), (2, "hello world"), (3, "hello world")],
        "doc_id long, text string",
    )
    fp = {r["__id"]: r["__fp"] for r in
          simhash_df(docs, "doc_id", "text", bits=16).collect()}
    # "" tokenizes to [""] (Java-trim/DuckDB split parity), so the md5
    # path fingerprints the single empty token — deterministically
    assert fp[1] == 2848
    assert fp[2] == fp[3] != 0  # identical docs → identical fingerprint
    rfp = {r["__id"]: r["__fp"] for r in
           simhash_df(docs, "doc_id", "text", bits=16,
                      token_hash="rolling").collect()}
    # dialect-parity path: rolling_hash("") == 0 → all-zero fingerprint
    assert rfp[1] == 0
    assert rfp[2] == rfp[3] != 0


def test_sample_frames_short_payload_empty(spark):
    from nutdb_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    d = spark.createDataFrame([(1, "short")], "doc_id long, text string")
    assert sample_frames(with_binary_payload(d), frame_size=64).count() == 0


def test_hash_split_is_append_stable(spark):
    """A row's split assignment must not depend on which other rows are
    present (the append-stability / no-contamination contract)."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import sample_fraction, with_split

    full = spark.range(0, 1000).withColumnRenamed("id", "k")
    part = full.filter(F.col("k") < 300)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    sf = with_split(full, F.col("k"), fractions=fr).collect()
    sp = with_split(part, F.col("k"), fractions=fr).collect()
    full_map = {r["k"]: r["split"] for r in sf}
    assert all(full_map[r["k"]] == r["split"] for r in sp)
    # different salts give independent samples
    a = {r["k"] for r in sample_fraction(full, F.col("k"), 0.5, salt="a").collect()}
    b = {r["k"] for r in sample_fraction(full, F.col("k"), 0.5, salt="b").collect()}
    assert a != b and 300 < len(a) < 700 and 300 < len(b) < 700


def test_split_fractions_validated(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import with_split

    df = spark.range(10)
    with _pytest.raises(ValueError, match="> 1"):
        with_split(df, F.col("id"), fractions={"a": 0.9, "b": 0.2})
