"""Scale-technique proofs: salted skew joins produce identical results
to plain joins; bucketed tables co-locate joins with zero exchanges.
These are the explicit knobs for the cases AQE can't save (a single
hot key bigger than an executor; a fact-fact join repeated every run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def rows_key(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    from nutdb_spark.operators.skew import salted_join
    from nutdb_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o["o_custkey"] == c["c_custkey"])
    salted = salted_join(o, c, "o_custkey", "c_custkey", salt=4)
    cols = ["o_orderkey", "o_custkey", "c_custkey", "c_mktsegment"]
    assert rows_key(salted, cols) == rows_key(plain, cols)


def test_salted_join_left_outer(spark, sf_dir):
    from nutdb_spark.operators.skew import salted_join
    from nutdb_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey")
    )
    plain = c.join(big, c["c_custkey"] == big["o_custkey"], "left")
    salted = salted_join(c, big, "c_custkey", "o_custkey", salt=4, how="left")
    cols = ["c_custkey", "o_orderkey"]
    assert rows_key(salted, cols) == rows_key(plain, cols)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from nutdb_spark.sources import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Pre-bucketing both sides on the join key removes the join
    exchanges entirely — the repeated-fact-join pattern at 100 TB."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # and it still computes the right thing
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_asof_bucketed_equals_plain(spark, sf_dir):
    """The hot-key (time-bucketed) as-of join must produce exactly the
    rows of the plain per-key-window one."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.asof import asof_join, asof_join_bucketed
    from nutdb_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "click")
    # dedupe right timestamps per key: with duplicate (key, ts) right
    # rows both variants pick an arbitrary winner, which is fine for the
    # operator but not for an exact-equality test
    right = e.filter(F.col("event_type") == "purchase").dropDuplicates(
        ["user_id", "ts"]
    )
    kw = dict(
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload=["event_id", "value"],
    )
    plain = asof_join(left, right, **kw)
    bucketed = asof_join_bucketed(
        left, right, bucket=lambda c: F.floor(F.unix_timestamp(c) / 86400),
        **kw,
    )
    key = lambda rows: sorted(
        (r["event_id"], r["asof_event_id"], r["asof_value"]) for r in rows
    )
    a, b = key(plain.collect()), key(bucketed.collect())
    assert a == b and len(a) > 100


# --- round-6 late pipeline ops: chunking + temperature mixing ---------------


def test_chunk_tokens_overlap_and_coverage(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.text import chunk_tokens

    toks = [f"t{i}" for i in range(150)]
    df = spark.createDataFrame([(1, toks), (2, ["a"]), (3, [])],
                               "id int, w array<string>")
    out = chunk_tokens(df, "id", F.col("w"), size=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], {})[r["chunk_id"]] = r["chunk"]
    # empty doc dropped; single-token doc = one 1-token chunk
    assert 3 not in by_doc and by_doc[2] == {0: ["a"]}
    c = by_doc[1]
    # dense ids; starts at 48-stride; 150 tokens -> starts 1,49,97,145
    assert sorted(c) == [0, 1, 2, 3]
    assert c[0] == toks[0:64] and c[1] == toks[48:112]
    # consecutive full chunks overlap by size - stride = 16
    assert c[0][48:] == c[1][:16]
    # last partial chunk is the tail, kept
    assert c[3] == toks[144:150]
    # stride-prefix concatenation reconstructs the document exactly
    recon = c[0][:48] + c[1][:48] + c[2][:48] + c[3]
    assert recon == toks


def test_sample_temperature_rates(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import sample_temperature

    rows = [(i, "big") for i in range(4000)] + [
        (10_000 + i, "rare") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k long, dom string")
    kept = sample_temperature(df, F.col("k"), F.col("dom"), salt="t").collect()
    by_dom = {}
    for r in kept:
        by_dom[r["dom"]] = by_dom.get(r["dom"], 0) + 1
    # rarest domain keeps everything (threshold = grain)
    assert by_dom["rare"] == 40
    # 100x larger domain keeps ~sqrt(1/100) = 10% (hash noise allowed)
    assert 0.05 * 4000 < by_dom["big"] < 0.15 * 4000


def test_sample_temperature_membership_deterministic(spark):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import sample_temperature

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "k long, dom string"
    )
    a = {r["k"] for r in sample_temperature(df, F.col("k"), F.col("dom"), salt="x").collect()}
    b = {
        r["k"]
        for r in sample_temperature(
            df.repartition(7), F.col("k"), F.col("dom"), salt="x"
        ).collect()
    }
    assert a == b  # partition-layout independent


def test_sample_quota_exact_per_stratum(spark, sf_dir):
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import sample_quota
    from nutdb_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    out = sample_quota(d, F.col("doc_id"), F.col("source"), 3, salt="t")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got and all(got[s] == min(3, sizes[s]) for s in got)
    assert set(got) == {s for s in sizes}  # every stratum represented
    # deterministic across repartitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_quota(
            d.repartition(13), F.col("doc_id"), F.col("source"), 3, salt="t"
        ).collect()
    )
    assert a == b


def test_kfold_partition_and_cover_properties(spark):
    """Folds partition the keyspace (every row exactly one fold in
    [0,k)), assignment is partition-layout independent, and appending
    rows never moves an existing row's fold."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import kfold

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r["k"]: r["fold"] for r in kfold(df, F.col("k"), 5).collect()}
    assert set(a) == set(range(500))
    assert all(0 <= f < 5 for f in a.values())
    assert len(set(a.values())) == 5  # all folds populated at n=500
    b = {
        r["k"]: r["fold"]
        for r in kfold(df.repartition(11), F.col("k"), 5).collect()
    }
    assert a == b
    bigger = spark.createDataFrame([(i,) for i in range(800)], "k long")
    c = {r["k"]: r["fold"] for r in kfold(bigger, F.col("k"), 5).collect()}
    assert all(c[k] == a[k] for k in a)  # append-stable
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kfold(df, F.col("k"), 1)


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus, scores verified by hand: 'a b a b' has bigrams
    (a b)×2 + (b a); 'a b c' has (a b)+(b c); 'x' has none."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bigram_lm_scores(
            df, "doc_id", "text", rare_threshold=1
        ).collect()
    }
    # corpus counts: (a b)->3, (b a)->1, (b c)->1
    r1, r2, r3 = got[1], got[2], got[3]
    assert (r1["n_bigrams"], r1["rare_cnt"]) == (3, 1)  # (b a) is rare
    assert r1["avg_bg_cnt"] == (3 + 3 + 1) / 3
    assert (r2["n_bigrams"], r2["rare_cnt"]) == (2, 1)  # (b c) is rare
    assert r2["rare_rate"] == 0.5 and r2["avg_bg_cnt"] == 2.0
    assert (r3["n_bigrams"], r3["rare_cnt"]) == (0, 0)
    assert r3["rare_rate"] is None and r3["avg_bg_cnt"] is None
