"""[EXT] Event-time windowing + streaming entry points.

The dialect has no stream syntax (SURVEY.md §2.6 — nothing in the
reference grammar), so this is north-star extension scope: tumbling /
sliding / session windows over the `events` fixture, expressed with the
same built-ins (`F.window`, `F.session_window`) in batch and streaming
mode — the lowerings below take ANY DataFrame, batch or streaming.

Streaming use: ``read_events_stream`` → transform → ``run_available_now``
(file source, availableNow trigger, memory sink) — exercised by
tests/test_streaming.py, which asserts stream==batch equivalence with a
watermark configured for late data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _flatten(df: DataFrame, struct: str, renames: dict[str, str]) -> DataFrame:
    cols = [
        F.col(f"{struct}.{src}").alias(dst) for src, dst in renames.items()
    ] + [F.col(c) for c in df.columns if c != struct]
    return df.select(*cols)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling window aggregate; emits window_start/window_end."""
    out = df.groupBy(F.window(F.col(ts_col), duration), *keys).agg(*aggs)
    return _flatten(out, "window", {"start": "window_start", "end": "window_end"})


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Sliding window aggregate (duration > slide → overlapping)."""
    out = df.groupBy(F.window(F.col(ts_col), duration, slide), *keys).agg(*aggs)
    return _flatten(out, "window", {"start": "window_start", "end": "window_end"})


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session window aggregate (gap-based, per key)."""
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return _flatten(
        out,
        "session_window",
        {"start": "session_start", "end": "session_end"},
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, watermark: str | None = "10 minutes"
) -> DataFrame:
    """readStream over the events fixture directory (file source needs
    an explicit schema); optional event-time watermark on ts for
    late-data handling in stateful aggregations.

    The fixture stores ts as parquet TIMESTAMP(NANOS): read as raw
    nanos (legacy conf) and truncate to µs BEFORE the watermark, which
    needs a timestamp-typed event-time column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the fixture is a single file; the file stream source wants a
    # directory → stream the parent dir with a glob filter
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # LTZ (timestamp_micros), unlike the batch loader's NTZ: Spark
        # watermarks require TIMESTAMP — event-time semantics follow the
        # session timezone by design in Structured Streaming
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # fixture generations vary: TIMESTAMP(NANOS) vs TIMESTAMP_NTZ.
        # Watermarks reject NTZ ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]);
        # reinterpret the wall-clock values as session-tz instants
        stream = stream.withColumn("ts", F.to_timestamp("ts"))
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return stream


def run_available_now(stream_df: DataFrame, *, name: str | None = None) -> DataFrame:
    """Drain a bounded stream with trigger availableNow into a memory
    sink (complete mode) and return the result as a DataFrame."""
    table = name or f"snk_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(table)
