"""[EXT] Windowed-aggregation suite over the `events` fixture.

The window lowerings (streaming/windows.py) run identically on batch
and streaming DataFrames; here they run in batch mode so each has an
exact DuckDB oracle (time_bucket / gaps-and-islands). The streaming
execution path (watermark + availableNow + memory sink) is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.functions.exact import dsum, oracle_dsum
from nutdb_spark.sources import load_table
from nutdb_spark.streaming.windows import session, sliding, tumbling
from nutdb_spark.suite.registry import query


# DuckDB reads events.ts as TIMESTAMP_NS; Spark reads raw nanos and
# truncates to µs (sources/tables.py). Normalize the oracle the same way.
_EV = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


@query(
    "q_window_tumbling",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n, {oracle_dsum('value')} AS total
    FROM {_EV} e
    GROUP BY 1, 2, 3
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type."""
    e = load_table(spark, sf_dir, "events")
    return tumbling(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), dsum("value", "total")],
    )


@query(
    "q_window_sliding",
    f"""
    WITH starts AS (
      SELECT e.*, unnest([
        CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
        CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
      ]) AS window_start
      FROM {_EV} e)
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n, {oracle_dsum('value')} AS total
    FROM starts
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY 1, 2, 3
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — each event lands in
    two windows; the oracle enumerates the two candidate starts."""
    e = load_table(spark, sf_dir, "events")
    return sliding(
        e,
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), dsum("value", "total")],
    )


@query(
    "q_window_session",
    f"""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
      FROM {_EV} e),
    islands AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n
    FROM islands GROUP BY user_id, sid
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user. Spark's session_window
    end = last event + gap; the oracle's gaps-and-islands mirrors
    exactly that."""
    e = load_table(spark, sf_dir, "events")
    return session(
        e, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    )


# --- AS-OF join (J9; SURVEY §2.3) over events -----------------------------


@query(
    "q_asof_join",
    f"""
    SELECT l.event_id, l.user_id, r.event_id AS asof_event_id
    FROM (SELECT * FROM {_EV} WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM {_EV} WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the latest prior purchase of the same user —
    lowered as union + per-key window (one shuffle, no range join)."""
    from nutdb_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["p_event_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("asof_p_event_id").alias("asof_event_id")
    )


# --- custom stateful streaming (applyInPandasWithState) -------------------


_STREAM_SRC_CACHE: dict[tuple[str, str], str] = {}


def _stream_join_matrix_src(spark: SparkSession, sf_dir: str) -> str:
    """ONE shared micro-batch source for the whole stream-stream join
    matrix (inner/left/right/full — r12 verdict task 2b: the trio
    re-built identical two-sentinel availableNow harnesses three
    times, ~13 s of duplicated build per bench pass): two
    event-parity batches, then the two far-future sentinel batches
    that advance the watermark past every real window and force the
    flushing micro-batch. File-feed order is pinned with explicit
    ``os.utime`` mtime stamps instead of the old ``sleep(1.1)``
    spacing — deterministic AND free. The inner join doesn't need the
    sentinels but tolerates them (the sentinel match carries
    user_id = −1 and every entry filters ≥ 0 on read-back), so all
    four entries share this one cached build per (process, sf)."""
    import datetime as _dt
    import tempfile
    import time as _time

    src = _STREAM_SRC_CACHE.get(("join_matrix", sf_dir))
    if src is not None and os.path.isdir(src):
        return src
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    src = tempfile.mkdtemp(prefix="q_stream_join_matrix_src_") + "/src"
    seen: set[str] = set()
    t0 = _time.time() - 3600
    step = 0

    def write(df) -> None:
        nonlocal step
        df.coalesce(1).write.mode("append").parquet(src)
        stamp = t0 + 10 * step
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.startswith("part-") and p not in seen:
                os.utime(p, (stamp, stamp))
                seen.add(p)
        step += 1

    for parity in (0, 1):
        write(ev.filter(F.col("event_id") % 2 == parity))
    far = F.expr("max(ts) + INTERVAL 30 DAY")
    bounds = ev.select(far.alias("fts")).collect()[0]
    for i in (0, 1):
        fts = bounds["fts"] + _dt.timedelta(days=30 * i)
        write(
            spark.createDataFrame(
                [
                    (-1 - 10 * i, -1, "view", fts, 0.0),
                    (-2 - 10 * i, -1, "purchase", fts, 0.0),
                ],
                schema=ev.schema,
            )
        )
    _STREAM_SRC_CACHE[("join_matrix", sf_dir)] = src
    return src


def _stream_join_run(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    """Shared runner for the stream-stream join matrix: read both
    sides of the shared source as watermarked streams, join with
    ``how``, run append-mode availableNow into a fresh sink, read
    back with the sentinel rows dropped. NOTE: no sentinel filter
    inside the streaming plan — Catalyst pushes a deterministic row
    filter BELOW the eventTimeWatermark node into the file scan,
    which would drop the sentinels before they can advance the
    watermark (observed: batches read 0 rows, no flush)."""
    import tempfile

    src = _stream_join_matrix_src(spark, sf_dir)
    base = tempfile.mkdtemp(prefix=f"q_stream_join_{how}_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev_schema = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).schema

    def read(kind: str, ts_alias: str, id_alias: str) -> DataFrame:
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                # fixture ts is TIMESTAMP_NTZ; watermarks require LTZ.
                # Only the join window uses it (not the output), so
                # the session-zone reinterpretation is side-effect-free
                F.col("ts").cast("timestamp").alias(ts_alias),
                "value",
            )
            .withWatermark(ts_alias, "1 hour")
        )

    window = (
        (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    if how == "right_outer":
        # the preserved side is the RIGHT stream: purchases keep
        # user_id (the oracle emits p.user_id), views rename
        views = read("view", "v_ts", "view_id").drop("value")
        views = views.withColumnRenamed("user_id", "v_user")
        purchases = read("purchase", "p_ts", "purchase_id")
        joined = views.join(
            purchases,
            (F.col("v_user") == F.col("user_id")) & window,
            how,
        ).select("view_id", "purchase_id", "user_id", "value")
    else:
        views = read("view", "v_ts", "view_id").drop("value")
        purchases = read("purchase", "p_ts", "purchase_id")
        purchases = purchases.withColumnRenamed("user_id", "p_user")
        uid = (
            F.coalesce(F.col("user_id"), F.col("p_user")).alias("user_id")
            if how == "full_outer"
            else F.col("user_id")
        )
        joined = views.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & window,
            how,
        ).select("view_id", "purchase_id", uid, "value")
    # Stream-stream join state partitioning is FIXED per checkpoint at
    # the session's shuffle-partition count; 32 state-store instances
    # per side is pure micro-batch overhead at fixture scale (at real
    # scale you'd size this UP, and it's a fresh-checkpoint decision,
    # not a code change). 4 instances measured ~30% faster than 8 at
    # sf0.1 with identical output — still multi-partition, so the
    # cross-partition state semantics stay exercised. Scope the
    # setting to this query.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.read.schema(
            "view_id long, purchase_id long, user_id long, value double"
        )
        .parquet(out)
        .filter(F.col("user_id") >= 0)
    )


@query(
    "q_stream_dedup",
    f"SELECT user_id, event_id, value FROM {_EV}",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful dedup: the events fixture is written TWICE
    as two files and streamed one file per micro-batch through
    `streaming_dedup` (native streaming dropDuplicates — JVM keyed
    state) — batch 2 is 100%
    duplicates and must be dropped by per-key state, so the output
    equals the distinct original (event ids are unique in the fixture;
    the oracle is a plain projection). This is the one operator family
    that only exists under streaming execution — the entry runs the
    real stream (availableNow) to a parquet sink and returns the sink.
    """
    import tempfile

    from nutdb_spark.streaming.stateful import DEDUP_SCHEMA, streaming_dedup

    base = tempfile.mkdtemp(prefix="q_stream_dedup_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    # source files are immutable per sf_dir — write once per session;
    # checkpoint/state/sink stay per-call so every run streams afresh
    src = _STREAM_SRC_CACHE.get(("dedup", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_dedup_src_") + "/src"
        ev.coalesce(1).write.parquet(src)
        ev.coalesce(1).write.mode("append").parquet(src)  # duplicate file
        _STREAM_SRC_CACHE[("dedup", sf_dir)] = src
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(DEDUP_SCHEMA).parquet(out)


@query(
    "q_stream_enrich",
    f"SELECT event_id, user_id, user_id % 3 AS tier, value FROM {_EV}",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: events stream in two micro-
    batches and each batch broadcast-joins a STATIC dimension frame
    (per-user tier) inside the streaming query itself — the canonical
    fact-stream ⋈ dimension pattern. The static side is re-planned per
    micro-batch by Structured Streaming (picking up dimension changes),
    and with a broadcast dimension the stream side never shuffles —
    the property that matters when the fact stream is the 100 TB side.
    Oracle: the same join in batch (tier derives deterministically from
    user_id, so the enriched rows are exactly the events rows)."""
    import tempfile

    from pyspark.sql.functions import broadcast

    base = tempfile.mkdtemp(prefix="q_stream_enrich_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.pmod(F.col("user_id"), F.lit(3)))
    )
    src = _STREAM_SRC_CACHE.get(("enrich", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_enrich_src_") + "/src"
        for parity in (0, 1):
            ev.filter(F.col("event_id") % 2 == parity).coalesce(
                1
            ).write.mode("append").parquet(src)
        _STREAM_SRC_CACHE[("enrich", sf_dir)] = src
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    enriched = stream.join(broadcast(dim), "user_id").select(
        "event_id", "user_id", "tier", "value"
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        "event_id long, user_id long, tier long, value double"
    ).parquet(out)


@query(
    "q_stream_summing",
    f"""
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS total,
           COUNT(*) AS n
    FROM {_EV} GROUP BY event_type
    """,
)
def q_stream_summing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed incremental Summing maintenance, driver-checkable: the
    events fixture streams in TWO micro-batches into the hash-bucketed
    Summing state (each batch rewrites only its touched buckets), and
    the merged state must equal the one-shot batch aggregate. Values
    are floor-scaled to integers before summing, so cross-batch
    addition is associative and the result is bit-identical to the
    DuckDB oracle — the same exactness convention as the batch
    aggregates (functions/exact.py)."""
    import tempfile

    from nutdb_spark.streaming.summing import incremental_summing

    base = tempfile.mkdtemp(prefix="q_stream_summing_")
    state, ck = f"{base}/state", f"{base}/ck"
    # two deterministic halves (stable predicate split) → two files →
    # two micro-batches under maxFilesPerTrigger=1; the source files
    # are immutable per sf_dir, so write once per session
    src = _STREAM_SRC_CACHE.get(("summing", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_summing_src_") + "/src"
        ev = load_table(spark, sf_dir, "events")
        for parity in (0, 1):
            ev.filter(F.col("event_id") % 2 == parity).select(
                "event_type",
                (F.floor(F.col("value") * 10000)).cast("long").alias("__sv"),
            ).coalesce(1).write.mode("append").parquet(src)
        _STREAM_SRC_CACHE[("summing", sf_dir)] = src
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_summing(
        stream,
        keys=["event_type"],
        sums=["__sv"],
        state_path=state,
        checkpoint=ck,
        n_buckets=8,
    )
    q.awaitTermination()
    st = spark.read.parquet(state)
    return st.select(
        "event_type",
        (F.col("__sv").cast("double") / 10000.0).alias("total"),
        F.col("__n").alias("n"),
    )


@query(
    "q_stream_join",
    f"""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id, p.value AS value
    FROM {_EV} v JOIN {_EV} p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with an event-time range condition —
    the attribution pattern (purchase within 30 min of a view, same
    user). Both sides are genuine Structured Streaming sources (two
    micro-batch files each); watermarks on both event times let the
    state store evict rows older than the join window instead of
    buffering each stream forever — the property that keeps a
    two-stream join alive at 100 TB/day. Inner join in append mode
    emits each match exactly once, so the availableNow run over the
    bounded fixture equals the batch join (the DuckDB oracle).

    Scale shape: one shuffle per side on user_id into the symmetric
    hash-join state; watermark-bounded state; no driver collection.
    Shares the matrix source + runner (_stream_join_matrix_src /
    _stream_join_run) with the left/right/full entries.
    """
    return _stream_join_run(spark, sf_dir, "inner")


@query(
    "q_stream_join_left",
    f"""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id, p.value AS value
    FROM (SELECT * FROM {_EV} WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM LEFT OUTER join with an event-time range — the
    attribution pattern including the un-attributed views. Outer
    stream-stream joins only emit an unmatched left row once the
    watermark passes its join window (state-store eviction doubles as
    NULL-emission), so a bounded availableNow run needs the watermark
    pushed past all real data: a far-future sentinel micro-batch on
    BOTH streams (join watermark = min over inputs) closes every
    window, and sentinel rows (user_id < 0) are dropped post-join.
    With that, append-mode availableNow equals the batch LEFT JOIN
    (the DuckDB oracle) — matched rows exactly once, unmatched views
    exactly once with NULL purchase columns.

    Scale shape: identical to q_stream_join (one shuffle per side into
    watermark-bounded symmetric hash state); the sentinel trick is a
    bounded-replay artifact, not a production need (live streams
    advance watermarks forever). Shares the matrix source + runner.
    """
    return _stream_join_run(spark, sf_dir, "left_outer")


@query(
    "q_stream_funnel",
    """
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
      FROM events
    ),
    lv1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
    lv2 AS (
      SELECT DISTINCT a.user_id FROM e a JOIN e b ON a.user_id = b.user_id
      WHERE a.event_type = 'view' AND b.event_type = 'click'
        AND b.t >= a.t AND b.t - a.t <= 86400000000),
    lv3 AS (
      SELECT DISTINCT a.user_id FROM e a
      JOIN e b ON a.user_id = b.user_id
      JOIN e c ON a.user_id = c.user_id
      WHERE a.event_type = 'view' AND b.event_type = 'click'
        AND c.event_type = 'purchase'
        AND b.t >= a.t AND c.t >= b.t AND c.t - a.t <= 86400000000),
    lv AS (
      SELECT u.user_id,
             CASE WHEN u3.user_id IS NOT NULL THEN 3
                  WHEN u2.user_id IS NOT NULL THEN 2
                  WHEN u1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS lvl
      FROM (SELECT DISTINCT user_id FROM e) u
      LEFT JOIN lv1 u1 ON u.user_id = u1.user_id
      LEFT JOIN lv2 u2 ON u.user_id = u2.user_id
      LEFT JOIN lv3 u3 ON u.user_id = u3.user_id)
    SELECT CAST(lvl AS BIGINT) AS lvl, COUNT(*) AS n_users
    FROM lv GROUP BY lvl
    """,
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful STREAMING windowFunnel: the events fixture is split
    into two time-halves streamed one file per micro-batch; per-user
    DP state (latest chain-start per step) carries across batches, so
    the final level must equal the batch windowFunnel over the full
    history — which is exactly what the DuckDB EXISTS-chain oracle
    computes. This is the streaming form of sql_funnel: same 24 h
    view→click→purchase funnel, state bounded per user, levels emitted
    per batch and reduced by MAX (levels are monotone)."""
    import tempfile

    from nutdb_spark.streaming.stateful import (
        make_funnel_schemas,
        streaming_funnel,
    )

    base = tempfile.mkdtemp(prefix="q_stream_funnel_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        (F.col("event_type") == "view").alias("c0"),
        (F.col("event_type") == "click").alias("c1"),
        (F.col("event_type") == "purchase").alias("c2"),
    )
    src = _STREAM_SRC_CACHE.get(("funnel", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_funnel_src_") + "/src"
        # split by TIME so per-user order never goes backwards across
        # micro-batches (the operator's ordering contract)
        mid = ev.agg(
            F.percentile_approx("t", 0.5).alias("m")
        ).collect()[0]["m"]
        ev.filter(F.col("t") <= mid).coalesce(1).write.parquet(src)
        ev.filter(F.col("t") > mid).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _STREAM_SRC_CACHE[("funnel", sf_dir)] = src
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out_schema, _ = make_funnel_schemas(3)
    q = (
        streaming_funnel(stream, 86400000000, 3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = spark.read.schema(out_schema).parquet(out)
    per_user = snap.groupBy("user_id").agg(F.max("lvl").alias("lvl"))
    # users with no step-matching events are filtered before the state
    # op and never reach the sink — they are level 0 by definition
    all_users = ev.select("user_id").distinct()
    per_user = all_users.join(per_user, "user_id", "left").select(
        "user_id", F.coalesce("lvl", F.lit(0)).alias("lvl")
    )
    return per_user.groupBy("lvl").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_stream_join_full",
    f"""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           coalesce(v.user_id, p.user_id) AS user_id, p.value AS value
    FROM (SELECT * FROM {_EV} WHERE event_type = 'view') v
    FULL JOIN (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM FULL OUTER join with an event-time range —
    completes the streaming outer-join matrix (inner q_stream_join,
    left q_stream_join_left): unmatched VIEWS emit once with NULL
    purchase columns AND unmatched PURCHASES emit once with NULL view
    columns, both driven by watermark eviction of the symmetric hash
    state. Same two-sentinel bounded-replay technique as the left
    entry (watermark past all real data, then one more batch to
    flush); append-mode availableNow equals the batch FULL JOIN
    oracle exactly once per row. Shares the matrix source + runner."""
    return _stream_join_run(spark, sf_dir, "full_outer")


@query(
    "q_stream_join_right",
    f"""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           p.user_id, p.value AS value
    FROM (SELECT * FROM {_EV} WHERE event_type = 'view') v
    RIGHT JOIN (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM RIGHT OUTER join — completes the streaming outer
    matrix (inner/left/full/right): every purchase emits exactly once,
    with NULL view columns when no view preceded it inside the
    30-minute window. Same two-sentinel bounded-replay machinery as
    the left/full entries (the watermark must pass the join window
    before unmatched state evicts-and-emits); the preserved side is
    the RIGHT stream, so the eviction happens from the views' state
    store. Oracle = batch RIGHT JOIN. Shares the matrix source +
    runner."""
    return _stream_join_run(spark, sf_dir, "right_outer")


@query(
    "q_stream_session_state",
    f"""
    WITH src AS (SELECT * FROM {_EV} WHERE user_id < 40),
    ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
      FROM src),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sv
    FROM islands GROUP BY user_id, sid
    """,
)
def q_stream_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows — gap-based sessionization under real
    micro-batch execution: events replay two files at a time into
    `session_window` state that MERGES sessions across batches (an
    event in batch 2 can extend a batch-1 session), and a closed
    session only emits once the watermark passes its end. Same
    two-sentinel bounded-replay machinery as the stream-stream joins
    (first sentinel advances the watermark past every real session,
    second forces the evicting micro-batch); append-mode availableNow
    then equals the batch gaps-and-islands oracle exactly — each
    session once, end = last event + gap.

    Scale shape: one shuffle on user_id into watermark-bounded session
    state; state size is O(open sessions), not O(events)."""
    import tempfile
    import time as _time

    from nutdb_spark.streaming.windows import session

    base = tempfile.mkdtemp(prefix="q_stream_session_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    src = _STREAM_SRC_CACHE.get(("session", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_session_src_") + "/src"
        # feed order pinned with explicit mtime stamps (the
        # _stream_join_matrix_src idiom) instead of sleep(1.1)
        # spacing — deterministic AND free (4.4 s of build sleep gone)
        seen: set[str] = set()
        t0 = _time.time() - 3600
        step = 0

        def _stamp() -> None:
            nonlocal step
            stamp = t0 + 10 * step
            for f in os.listdir(src):
                p = os.path.join(src, f)
                if f.startswith("part-") and p not in seen:
                    os.utime(p, (stamp, stamp))
                    seen.add(p)
            step += 1

        for parity in (0, 1):
            ev.filter(F.col("user_id") % 2 == parity).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            _stamp()
        import datetime as _dt

        far = ev.select(
            F.expr("max(ts) + INTERVAL 30 DAY").alias("fts")
        ).collect()[0]["fts"]
        for i in (0, 1):
            sent = spark.createDataFrame(
                [(-1, far + _dt.timedelta(days=30 * i), 0.0)],
                schema=ev.schema,
            )
            sent.coalesce(1).write.mode("append").parquet(src)
            _stamp()
        _STREAM_SRC_CACHE[("session", sf_dir)] = src
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    sess = session(
        stream,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sv"),
        ],
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.read.schema(
            "session_start timestamp, session_end timestamp, "
            "user_id long, n long, sv long"
        )
        .parquet(out)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n", "sv")
    )


_CUSUM_T, _CUSUM_H = 6000, 40000

_CUSUM_FOLD = f"""list_reduce(
  [[CAST(0 AS BIGINT), 0, 0]] ||
  list_transform(list_sort(ev), e -> [e[1], e[2], 0]),
  (a, e) -> CASE
    WHEN greatest(0, a[1] + e[2] - {_CUSUM_T}) > {_CUSUM_H}
    THEN [CAST(0 AS BIGINT), a[2] + 1, a[3] + 1]
    ELSE [greatest(0, a[1] + e[2] - {_CUSUM_T}), a[2], a[3] + 1] END)"""


@query(
    "q_stream_cusum",
    f"""
    WITH g AS (
      SELECT user_id,
             list([epoch_us(ts), CAST(floor(value * 100) AS BIGINT)]) AS ev
      FROM events WHERE user_id < 40 GROUP BY user_id)
    SELECT user_id,
           ({_CUSUM_FOLD})[3] AS seen,
           ({_CUSUM_FOLD})[2] AS n_alerts,
           ({_CUSUM_FOLD})[1] AS s
    FROM g ORDER BY user_id
    """,
)
def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CUSUM drift detection per user: integer one-sided
    CUSUM (s' = max(0, s + x − target); s' > h → alert + reset) over
    value measurements in ts order, run as a REAL two-micro-batch
    stream (the source splits at a ts cutoff, so batch order is time
    order — CUSUM is order-dependent, unlike the order-free stateful
    dedup/totals ops; within a batch the operator sorts by (ts, x)).
    State is three integers per user, carried across batches by
    applyInPandasWithState; the final row per user is the one with
    the maximum monotone `seen` counter. The oracle replays the
    identical fold over the (ts, x)-sorted events — integer-exact."""
    import tempfile
    import time as _time

    from pyspark.sql import Window

    from nutdb_spark.streaming.stateful import CUSUM_SCHEMA, cusum_alerts

    base = tempfile.mkdtemp(prefix="q_stream_cusum_")
    out, ck = f"{base}/out", f"{base}/ck"
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor(F.col("value") * 100).cast("long").alias("x"),
        )
    )
    src = _STREAM_SRC_CACHE.get(("cusum", sf_dir))
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix="q_stream_cusum_src_") + "/src"
        cutoff = ev.select(
            F.expr("percentile(unix_micros(ts), 0.5)").alias("c")
        ).collect()[0]["c"]
        early = ev.filter(F.unix_micros("ts") <= cutoff)
        late = ev.filter(F.unix_micros("ts") > cutoff)
        # feed order pinned with mtime stamps, not sleep(1.1) spacing
        early.coalesce(1).write.mode("append").parquet(src)
        t0 = _time.time() - 3600
        for f in os.listdir(src):
            if f.startswith("part-"):
                os.utime(os.path.join(src, f), (t0, t0))
        late.coalesce(1).write.mode("append").parquet(src)
        _STREAM_SRC_CACHE[("cusum", sf_dir)] = src
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        cusum_alerts(stream, target=_CUSUM_T, h=_CUSUM_H)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.schema(CUSUM_SCHEMA).parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.col("seen").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "seen", "n_alerts", "s")
    )


# --- [EXT] streaming near-dup ingest (foreachBatch band-index growth) -------


@query(
    "q_stream_dedup_neardup",
    # stream ≡ one-shot batch replay: the oracle is the same full-corpus
    # LSH dedup that grades q_dedup_incremental
    __import__(
        "nutdb_spark.suite.dedup", fromlist=["_INCREMENTAL_ORACLE"]
    )._INCREMENTAL_ORACLE,
)
def q_stream_dedup_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest near-dup dedup: documents arrive as a file
    stream (one file per micro-batch, ascending doc_id), and a
    foreachBatch sink runs `incremental_near_dedup` against the
    PERSISTED MinHash band index — each micro-batch probes only the
    index parquet (corpus text never re-shingled), appends its own
    band rows (dropped docs' rows too, the replay contract), and
    appends its survivors. The closing of the batch/streaming gap: the
    nightly-ingest operator (q_dedup_incremental) and this entry share
    the identical per-batch engine, and BOTH must equal the one-shot
    full-corpus LSH oracle. State is the parquet index itself — no
    driver-side accumulation; at 100 TB the index is a bucketed table
    and each micro-batch's probe is a co-located equi-join."""
    import tempfile
    import time

    from nutdb_spark.operators.dedup import incremental_near_dedup

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    hi = d.agg(F.max("doc_id")).first()[0]  # bounded collect: one row
    split = (hi + 1) // 2
    kw = dict(n=4, num_hashes=8, bands=4, est_threshold=0.75)

    src = _STREAM_SRC_CACHE.get(("neardup", sf_dir))
    if src is None or not os.path.isdir(src):
        import shutil

        root = tempfile.mkdtemp(prefix="q_stream_neardup_src_")
        src = root + "/src"
        os.makedirs(src)
        # FileStreamSource orders files by modification time (ties by
        # path): write each batch separately, move its single part file
        # under a controlled name, and stamp strictly increasing mtimes
        # so batch 1 (low ids) always precedes batch 2 — the
        # keep-first-by-id replay contract depends on it.
        now = time.time()
        for i, batch in enumerate(
            (
                d.filter(F.col("doc_id") < split),
                d.filter(F.col("doc_id") >= split),
            )
        ):
            stage = os.path.join(root, f"stage{i}")
            batch.coalesce(1).write.parquet(stage)
            [part] = [
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (now - 100 + i, now - 100 + i))
        _STREAM_SRC_CACHE[("neardup", sf_dir)] = src

    base = tempfile.mkdtemp(prefix="q_stream_neardup_")
    out, ck, idx = f"{base}/out", f"{base}/ck", f"{base}/index"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        from nutdb_spark.operators.dedup import minhash_band_rows

        index = None
        if os.path.isdir(idx) and any(
            f.endswith(".parquet") for f in os.listdir(idx)
        ):
            index = spark.read.parquet(idx)
        # shingle+sign the delta EXACTLY ONCE (the band_rows
        # passthrough the connected-incremental ingest already uses):
        # without the checkpoint, the index write and the survivors
        # write each re-ran the batch's full minhash pass
        d_rows = minhash_band_rows(
            batch_df, "doc_id", "text",
            n=kw["n"], num_hashes=kw["num_hashes"], bands=kw["bands"],
        ).localCheckpoint()
        surv, rows = incremental_near_dedup(
            batch_df, index, "doc_id", "text", band_rows=d_rows, **kw
        )
        # persist FIRST (rows feed the next batch), then the survivors
        rows.write.mode("append").parquet(idx)
        surv.select("doc_id", "lang").write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@query(
    "q_stream_merge_cdc",
    # stream-of-merges ≡ last-writer-wins snapshot: applying each
    # micro-batch's latest-per-key records through the ordered MERGE
    # clauses must leave exactly the state of the newest event per key
    # (absent when that event is a delete)
    """
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(floor(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS del
      FROM events),
    l AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) AS rk
      FROM ev)
    SELECT user_id, v, CAST(event_id AS BIGINT) AS last_event
    FROM l WHERE rk = 1 AND del = 0
    ORDER BY user_id
    """,
)
def q_stream_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Streaming CDC apply — the lakehouse upsert loop: change
    records arrive as a file stream (two micro-batches, ascending
    event_id), each batch compacts to its latest record per key (the
    standard pre-MERGE rank step — MERGE's cardinality rule demands
    it) and applies as ONE MERGE INTO: matched deletes retire rows,
    matched updates overwrite, unmatched non-deletes insert, unmatched
    deletes fall through. The oracle is the last-writer-wins snapshot
    over ALL events — the statement of CDC-apply correctness: a stream
    of batched merges must equal the one-shot latest-state view. State
    is the catalog table itself (no driver accumulation); each batch
    costs one decision join against the current target."""
    import tempfile
    import time

    from nutdb_spark.engine import NutEngine
    from nutdb_spark.frontend import ast_nodes as A

    eng = NutEngine(spark, data_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS cdc_tgt")
    eng.sql(
        "CREATE TABLE cdc_tgt (user_id Int64, v Int64, last_event Int64)"
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
    )
    hi = ev.agg(F.max("event_id")).first()[0]  # bounded: one row
    split = (hi + 1) // 2

    src = _STREAM_SRC_CACHE.get(("merge_cdc", sf_dir))
    if src is None or not os.path.isdir(src):
        import shutil
        import tempfile as _tf

        root = _tf.mkdtemp(prefix="q_stream_cdc_src_")
        src = root + "/src"
        os.makedirs(src)
        now = time.time()
        for i, batch in enumerate(
            (
                ev.filter(F.col("event_id") < split),
                ev.filter(F.col("event_id") >= split),
            )
        ):
            stage = os.path.join(root, f"stage{i}")
            batch.coalesce(1).write.parquet(stage)
            [part] = [
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (now - 100 + i, now - 100 + i))
        _STREAM_SRC_CACHE[("merge_cdc", sf_dir)] = src

    def sident(name):
        return A.Ident(name, "s")

    def tident(name):
        return A.Ident(name, "cdc_tgt")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
        latest = (
            batch_df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk")
        )
        stmt = A.MergeStmt(
            "cdc_tgt",
            None,
            latest,
            "s",
            A.BinOp("=", tident("user_id"), sident("user_id")),
            [
                (
                    A.BinOp("=", sident("op"), A.Lit("d", "string")),
                    ("delete",),
                ),
                (
                    None,
                    (
                        "update",
                        [("v", sident("v")), ("last_event", sident("event_id"))],
                    ),
                ),
            ],
            [
                (
                    A.BinOp("!=", sident("op"), A.Lit("d", "string")),
                    ["user_id", "v", "last_event"],
                    [sident("user_id"), sident("v"), sident("event_id")],
                )
            ],
        )
        from nutdb_spark.frontend.lower import Lowerer

        low = Lowerer(
            spark, eng.resolve_table, None, config=eng.config,
            list_tables=eng._list_tables,
        )
        eng.catalog.merge(stmt, low)

    base = tempfile.mkdtemp(prefix="q_stream_cdc_")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return eng.sql(
        "SELECT user_id, v, last_event FROM cdc_tgt ORDER BY user_id"
    )


# --- [EXT] round-12 session-3: streaming curation ingest ---------------------


def _stream_curate_oracle() -> str:
    from nutdb_spark.operators.dedup import oracle_dedup_repeated_ngrams
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, oracle_gopher

    gate = oracle_gopher("text", stopwords=ENGLISH_STOPWORDS)["passes"]
    sub = oracle_dedup_repeated_ngrams(k=8, max_freq=1, source="gated")
    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < 300 AND {gate}),
cleaned AS ({sub})
SELECT doc_id, n_words, n_removed, clean_text FROM cleaned
ORDER BY doc_id"""


@query("q_stream_curate", _stream_curate_oracle())
def q_stream_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Continuous-ingest CURATION: documents arrive as a file
    stream (one file per micro-batch, ascending doc_id); each batch
    passes the Gopher gate (stateless map-side) and then runs the
    incremental exact-substring span dedup against the PERSISTED gram
    index — including REVISIONS of already-emitted documents when a
    new batch flips one of their 8-grams over the corpus threshold
    (the property no keep-first streaming dedup has). State is
    versioned parquet per micro-batch (state/v=N read by batch N+1 —
    never read-and-overwrite the same path); emitted rows carry their
    batch id and the result view is latest-batch-per-doc. The merged
    stream output must equal the ONE-SHOT gate → span-dedup oracle
    over the full slice row-for-row — the same first two stages as
    q_pipeline_curate, proving the batch pipeline and the streaming
    ingest are the same computation."""
    import shutil
    import tempfile
    import time

    from nutdb_spark.operators.dedup import incremental_repeated_ngrams
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, gopher_rules

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    split = 150

    src = _STREAM_SRC_CACHE.get(("curate", sf_dir))
    if src is None or not os.path.isdir(src):
        root = tempfile.mkdtemp(prefix="q_stream_curate_src_")
        src = root + "/src"
        os.makedirs(src)
        now = time.time()
        for i, batch in enumerate(
            (
                d.filter(F.col("doc_id") < split),
                d.filter(F.col("doc_id") >= split),
            )
        ):
            stage = os.path.join(root, f"stage{i}")
            batch.coalesce(1).write.parquet(stage)
            [part] = [
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (now - 100 + i, now - 100 + i))
        _STREAM_SRC_CACHE[("curate", sf_dir)] = src

    base = tempfile.mkdtemp(prefix="q_stream_curate_")
    out, ck, state = f"{base}/out", f"{base}/ck", f"{base}/state"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        gated = batch_df.filter(
            gopher_rules(F.col("text"), stopwords=ENGLISH_STOPWORDS)[
                "passes"
            ]
        ).select("doc_id", "text")
        prev = os.path.join(state, f"v={batch_id - 1}")
        index = None
        if os.path.isdir(os.path.join(prev, "occ")):
            index = tuple(
                spark.read.parquet(os.path.join(prev, part))
                for part in ("occ", "docs", "cnt")
            )
        cleaned, occ, docs, cnt = incremental_repeated_ngrams(
            gated, index, "doc_id", "text", k=8, max_freq=1
        )
        cur = os.path.join(state, f"v={batch_id}")
        for part, df_part in (("occ", occ), ("docs", docs), ("cnt", cnt)):
            df_part.write.mode("overwrite").parquet(
                os.path.join(cur, part)
            )
        cleaned.withColumn("__batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("__batch").desc())
    return (
        spark.read.parquet(out)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("doc_id", "n_words", "n_removed", "clean_text")
        .orderBy("doc_id")
    )


def _stream_dsir_oracle() -> str:
    from nutdb_spark.operators.sampling import DSIR_DIM, DSIR_SCALE
    from nutdb_spark.operators.sampling import oracle_hash_bucket
    from nutdb_spark.operators.text import (
        oracle_ngrams,
        oracle_normalize,
        oracle_tokenize,
    )

    words = (
        f"list_filter({oracle_tokenize(oracle_normalize('text'))}, "
        "t -> length(t) > 0)"
    )
    f_of = oracle_hash_bucket("feat", "dsir", grain=DSIR_DIM)
    return f"""
WITH tb AS (
  SELECT CAST(lang = 'en' AS INT) AS tgt, {words} AS w
  FROM documents WHERE doc_id < 200),
tf AS (
  SELECT tgt, {f_of} AS f
  FROM (SELECT tgt, unnest(list_concat(w, {oracle_ngrams('w', 2)})) AS feat
        FROM tb)),
ratio AS (
  SELECT f, ((sum(tgt) + 1) * {DSIR_SCALE}) // (count(*) + 1) AS r
  FROM tf GROUP BY f),
sb AS (
  SELECT doc_id, {words} AS w
  FROM documents WHERE doc_id >= 200 AND doc_id < 400),
sf AS (
  SELECT doc_id, {f_of} AS f
  FROM (SELECT doc_id, unnest(list_concat(w, {oracle_ngrams('w', 2)}))
          AS feat FROM sb)),
per AS (
  SELECT doc_id, count(*) AS n_feats,
         sum(coalesce(r, {DSIR_SCALE})) AS score
  FROM sf LEFT JOIN ratio USING (f) GROUP BY doc_id)
SELECT b.doc_id,
       CAST(coalesce(p.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(coalesce(p.score, 0) AS BIGINT) AS score
FROM sb b LEFT JOIN per p USING (doc_id)
ORDER BY b.doc_id"""


@query("q_stream_dsir", _stream_dsir_oracle())
def q_stream_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Streaming DSIR scoring with FROZEN weights — the
    train/apply split a production selection stage runs: the
    importance-ratio table is fit ONCE on the reference corpus
    (docs < 200, target = labeled-English) and persisted; the
    document stream (docs 200–399, two micro-batches) scores against
    that frozen broadcast table per batch, with unseen buckets read
    as the add-one-smoothed neutral value. Scores are
    corpus-position-independent — a document gets the same score in
    any batch order, the property per-batch re-derived ratios would
    destroy — so stream output ≡ the one-shot frozen-table oracle."""
    import shutil
    import tempfile
    import time

    from nutdb_spark.operators.sampling import (
        dsir_ratio_table,
        dsir_score_against,
    )

    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") < 200)
    stream_docs = d.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 400)
    ).select("doc_id", "text")

    base = tempfile.mkdtemp(prefix="q_stream_dsir_")
    model, out, ck = f"{base}/model", f"{base}/out", f"{base}/ck"
    dsir_ratio_table(ref, "text", F.col("lang") == "en").write.mode(
        "overwrite"
    ).parquet(model)
    frozen = spark.read.parquet(model)

    src = _STREAM_SRC_CACHE.get(("dsir", sf_dir))
    if src is None or not os.path.isdir(src):
        root = tempfile.mkdtemp(prefix="q_stream_dsir_src_")
        src = root + "/src"
        os.makedirs(src)
        now = time.time()
        for i, batch in enumerate(
            (
                stream_docs.filter(F.col("doc_id") < 300),
                stream_docs.filter(F.col("doc_id") >= 300),
            )
        ):
            stage = os.path.join(root, f"stage{i}")
            batch.coalesce(1).write.parquet(stage)
            [part] = [
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (now - 100 + i, now - 100 + i))
        _STREAM_SRC_CACHE[("dsir", sf_dir)] = src

    def score(batch_df: DataFrame, batch_id: int) -> None:
        dsir_score_against(
            batch_df, "doc_id", "text", frozen
        ).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(stream_docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(score)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).orderBy("doc_id")


# --- [EXT] streaming HLL ingest (foreachBatch register growth) ---------------


@query(
    "q_stream_sketch_hll",
    # stream ≡ one-shot batch replay: the oracle is the direct
    # whole-corpus sketch (shared with q_sketch_hll_incremental)
    __import__(
        "nutdb_spark.suite.sketch_suite",
        fromlist=["_hll_incremental_oracle"],
    )._hll_incremental_oracle(),
)
def q_stream_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest HLL: events arrive as a file stream (one file
    per micro-batch, ascending event_id) and a foreachBatch sink
    APPENDS each micro-batch's register table to the sketch store —
    no read-modify-write cycle at all, because register-max is
    associative: the final state is one groupBy-max over the appended
    rows, and the result must equal the direct whole-corpus sketch
    (the q_sketch_hll_incremental oracle, shared). The streaming
    sibling of the nightly-ingest entry: at 100 TB each micro-batch
    contributes ≤256 rows per group whatever its size, the store is
    append-only (object-store friendly), and compaction is the same
    groupBy-max whenever convenient."""
    import tempfile
    import time

    from nutdb_spark.operators.sketch import hll_estimate, hll_registers
    from nutdb_spark.suite.sketch_suite import _P, _uday

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts"
    )
    hi = e.agg(F.max("event_id")).first()[0]  # bounded collect: one row
    split = (hi + 1) // 2

    src = _STREAM_SRC_CACHE.get(("sketch_hll", sf_dir))
    if src is None or not os.path.isdir(src):
        import shutil

        root = tempfile.mkdtemp(prefix="q_stream_hll_src_")
        src = root + "/src"
        os.makedirs(src)
        now = time.time()
        for i, batch in enumerate(
            (
                e.filter(F.col("event_id") < split),
                e.filter(F.col("event_id") >= split),
            )
        ):
            stage = os.path.join(root, f"stage{i}")
            batch.coalesce(1).write.parquet(stage)
            [part] = [
                f
                for f in os.listdir(stage)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (now - 100 + i, now - 100 + i))
        _STREAM_SRC_CACHE[("sketch_hll", sf_dir)] = src

    base = tempfile.mkdtemp(prefix="q_stream_hll_")
    ck, idx = f"{base}/ck", f"{base}/index"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, ["event_type"], _uday(), p=_P)
        regs.write.mode("append").parquet(idx)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = (
        spark.read.parquet(idx)
        .groupBy("event_type", "idx")
        .agg(F.max("m").alias("m"))
    )
    return hll_estimate(state, ["event_type"], p=_P).orderBy("event_type")
