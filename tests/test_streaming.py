"""Structured Streaming execution path: the window lowerings must
produce identical results when driven through readStream (file source,
watermark, availableNow trigger, memory sink) as in batch mode."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tumbling_stream_equals_batch(spark, sf_dir):
    from nutdb_spark.sources import load_table
    from nutdb_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        tumbling,
    )

    batch = tumbling(
        load_table(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    stream_src = read_events_stream(spark, sf_dir, watermark="10 minutes")
    streamed = tumbling(
        stream_src, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    got = run_available_now(streamed)
    key = lambda rows: sorted(  # noqa: E731
        (r["window_start"], r["event_type"], r["n"]) for r in rows
    )
    assert key(got.collect()) == key(batch.collect())


def test_session_window_streaming_mode(spark, sf_dir):
    """Session windows are stateful — verify the streaming planner
    accepts the same lowering (update-mode incompatible sinks aside,
    availableNow + complete works for the bounded fixture)."""
    from nutdb_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        session,
    )

    src = read_events_stream(spark, sf_dir, watermark="1 hour")
    sess = session(src, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")])
    got = run_available_now(sess)
    assert got.count() > 0


def test_stateful_dedup_stream(spark, sf_dir):
    """applyInPandasWithState dedup: streamed result must equal the
    batch distinct over (user_id, event_id)."""
    from nutdb_spark.sources import load_table
    from nutdb_spark.streaming.stateful import streaming_dedup
    from nutdb_spark.streaming.windows import read_events_stream

    src = read_events_stream(spark, sf_dir, watermark=None)
    deduped = streaming_dedup(src)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_snk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_snk")
    batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id")
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.select("user_id", "event_id").distinct().count() == got.count()


def test_stateful_running_totals(spark, sf_dir):
    from nutdb_spark.sources import load_table
    from nutdb_spark.streaming.stateful import running_totals
    from nutdb_spark.streaming.windows import read_events_stream

    from pyspark.sql import functions as F2

    src = read_events_stream(spark, sf_dir, watermark=None)
    q = (
        running_totals(src)
        .writeStream.format("memory")
        .queryName("totals_snk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in spark.table("totals_snk").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("value").alias("total"))
        .collect()
    }
    assert got == batch


def test_incremental_summing_view(spark, sf_dir, tmp_path):
    """foreachBatch Summing merge across MULTIPLE micro-batches must
    equal the one-shot batch aggregate (merge associativity)."""
    from nutdb_spark.sources import load_table
    from nutdb_spark.streaming.summing import incremental_summing

    # split events into 4 files so maxFilesPerTrigger=1 gives 4 batches
    src_dir = str(tmp_path / "events_parts")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    state = str(tmp_path / "summing_state")
    q = incremental_summing(
        stream,
        keys=["event_type"],
        sums=["value"],
        state_path=state,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    got = {
        r["event_type"]: (round(r["value"], 6), r["__n"])
        for r in spark.read.parquet(state).collect()
    }
    from pyspark.sql import functions as F2

    want = {
        r["event_type"]: (round(r["value"], 6), r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F2.sum("value").alias("value"), F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_summing_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch touching one key's bucket must leave every other
    bucket's files physically untouched (O(touched) maintenance, not
    O(state))."""
    import os

    from pyspark.sql import functions as F2

    from nutdb_spark.streaming.summing import summing_merge_batch

    state = str(tmp_path / "bstate")
    wide = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(200)], "k string, v double"
    )
    summing_merge_batch(wide, ["k"], ["v"], state, n_buckets=16)
    dirs = sorted(d for d in os.listdir(state) if d.startswith("__bucket="))
    assert len(dirs) > 4  # 200 keys spread over 16 buckets
    before = {
        d: max(
            os.path.getmtime(os.path.join(state, d, f))
            for f in os.listdir(os.path.join(state, d))
        )
        for d in dirs
    }

    one = spark.createDataFrame([("k3", 10.0)], "k string, v double")
    (b3,) = (
        one.select(
            F2.pmod(F2.xxhash64("k"), F2.lit(16)).cast("int").alias("b")
        ).collect()
    )
    summing_merge_batch(one, ["k"], ["v"], state, n_buckets=16)

    after = {
        d: max(
            os.path.getmtime(os.path.join(state, d, f))
            for f in os.listdir(os.path.join(state, d))
        )
        for d in sorted(
            d for d in os.listdir(state) if d.startswith("__bucket=")
        )
    }
    for d in dirs:
        if d == f"__bucket={b3['b']}":
            assert after[d] > before[d]
        else:
            assert after[d] == before[d], f"untouched bucket {d} rewritten"

    # merged value is exact: k3 summed across both batches
    got = {
        r["k"]: (r["v"], r["__n"])
        for r in spark.read.parquet(state).collect()
    }
    assert got["k3"] == (13.0, 2)
    assert len(got) == 200


def test_streaming_funnel_equals_batch(spark, tmp_path):
    """The carried DP state across micro-batches must reproduce the
    batch windowFunnel exactly (time-split batches)."""
    import random

    import pyspark.sql.functions as F

    from nutdb_spark.functions.registry import PARAMETRIC_AGGS
    from nutdb_spark.streaming.stateful import (
        make_funnel_schemas,
        streaming_funnel,
    )

    rnd = random.Random(3)
    rows = []
    for uid in range(12):
        for i in range(30):
            rows.append(
                (uid, rnd.randrange(0, 10_000) * 100 + uid * 7 + i,
                 rnd.randrange(3))
            )
    df = spark.createDataFrame(rows, "user_id long, t long, s int").select(
        "user_id", "t",
        (F.col("s") == 0).alias("c0"),
        (F.col("s") == 1).alias("c1"),
        (F.col("s") == 2).alias("c2"),
    )
    WIN = 50_000
    batch = {
        r["user_id"]: r["lvl"]
        for r in df.groupBy("user_id").agg(
            PARAMETRIC_AGGS["windowFunnel"](
                [WIN], F.col("t"), F.col("c0"), F.col("c1"), F.col("c2")
            ).alias("lvl")
        ).collect()
    }

    src = str(tmp_path / "src")
    mid = df.agg(F.percentile_approx("t", 0.5).alias("m")).collect()[0]["m"]
    df.filter(F.col("t") <= mid).coalesce(1).write.parquet(src)
    df.filter(F.col("t") > mid).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    out_schema, _ = make_funnel_schemas(3)
    q = (
        streaming_funnel(stream, WIN, 3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = spark.read.schema(out_schema).parquet(out)
    streamed = {
        r["user_id"]: r["lvl"]
        for r in snap.groupBy("user_id")
        .agg(F.max("lvl").alias("lvl"))
        .collect()
    }
    assert streamed == batch


def test_cusum_alerts_hand_computed(spark, tmp_path):
    """Two time-ordered micro-batches; CUSUM state must carry across
    the batch boundary: drift accumulates in batch 1 and the alert
    fires in batch 2."""
    import time as _time

    import pyspark.sql.functions as F

    from nutdb_spark.streaming.stateful import CUSUM_SCHEMA, cusum_alerts

    rows1 = [(1, i, 15) for i in range(1, 5)]   # s: 5,10,15,20
    rows2 = [(1, i, 15) for i in range(5, 9)]   # s: 25,30 -> alert at 30? h=28
    src = str(tmp_path / "src")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    df1 = spark.createDataFrame(rows1, "user_id long, ts long, x long").select(
        "user_id", F.timestamp_micros(F.col("ts") * 1000000).alias("ts"), "x"
    )
    df2 = spark.createDataFrame(rows2, "user_id long, ts long, x long").select(
        "user_id", F.timestamp_micros(F.col("ts") * 1000000).alias("ts"), "x"
    )
    df1.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    df2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        cusum_alerts(stream, target=10, h=28)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.schema(CUSUM_SCHEMA).parquet(out).collect()
    assert len(emitted) == 2  # one snapshot per batch
    final = max(emitted, key=lambda r: r["seen"])
    # s walks 5,10,15,20 | 25,30>28 -> alert+reset, then 5,10
    assert (final["seen"], final["n_alerts"], final["s"]) == (8, 1, 10)
    mid = min(emitted, key=lambda r: r["seen"])
    assert (mid["seen"], mid["n_alerts"], mid["s"]) == (4, 0, 20)


def test_streaming_dedup_native_matches_python_state(spark, sf_dir):
    """The native dropDuplicates rewrite of streaming_dedup must emit
    exactly the rows of the original applyInPandasWithState form on a
    duplicate-heavy two-batch replay (the equivalence pin for the r13
    rewrite)."""
    import tempfile

    from nutdb_spark.sources import load_table
    from nutdb_spark.streaming.stateful import (
        streaming_dedup,
        streaming_dedup_python,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    src = tempfile.mkdtemp(prefix="dedup_eq_src_") + "/src"
    ev.coalesce(1).write.parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # 100% dup batch

    def run(build, name):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    native = run(streaming_dedup, "dedup_eq_native")
    python = run(streaming_dedup_python, "dedup_eq_python")
    assert native.count() == python.count()
    assert native.exceptAll(python).count() == 0
    assert python.exceptAll(native).count() == 0
