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
