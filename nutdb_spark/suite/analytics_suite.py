"""[EXT] Windowed analytics + hierarchical aggregation over the fixtures.

The reference dialect has no ``OVER`` grammar and no ``GROUPING
SETS``/``ROLLUP`` (SURVEY.md §2.6 — absent from the grammar by
design), but an analytics engine's users need both; these entries
expose them at the DataFrame/API level, the same [EXT] precedent as
streaming.

Determinism notes (the driver hash-compares values vs DuckDB):

- Every ordered frame is ``ROWS`` with a full tie-break (``ts,
  event_id``) — ``RANGE`` defaults differ across engines when the
  order key has duplicates.
- Double aggregation inside frames uses the floor-scaling convention
  (functions/exact.py): cumulative/sliding sums are exact BIGINT sums
  of ``floor(value·10⁴)``. This matters *more* for windows than for
  GROUP BY: DuckDB evaluates sliding frames with a segment tree, so
  even a same-order IEEE sum would drift in the last ulp.

Scale: a window partitioned by a key is ONE hash shuffle on that key
followed by a per-partition sort — no global sort, no driver state.
Top-N-per-group filters on ``row_number`` never materialize the full
ordered group to one node (Spark's WindowExec is streaming within the
partition; at 100 TB the only requirement is that one PARTITION BY
group fits an executor's spill budget, the same contract as any
groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nutdb_spark.functions.exact import SCALE
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_ORDERED = "PARTITION BY user_id ORDER BY ts, event_id"


@query(
    "q_analytic_running",
    f"""
    SELECT event_id, user_id,
           ROW_NUMBER() OVER ({_ORDERED}) AS seq,
           CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT))
                  OVER ({_ORDERED} ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / {SCALE}.0 AS running_sum,
           date_diff('microseconds',
                     LAG(ts) OVER ({_ORDERED}), ts) AS gap_us,
           CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT))
                  OVER ({_ORDERED} ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / {SCALE}.0
             / COUNT(*) OVER ({_ORDERED} ROWS BETWEEN 3 PRECEDING
                              AND CURRENT ROW) AS moving_avg
    FROM events
    WHERE user_id < 40
    """,
)
def q_analytic_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-time running aggregates: row_number, cumulative
    sum, gap-to-previous-event in exact microseconds (lag), and a
    4-row moving average — the sessionized-metrics workhorse. One
    shuffle on user_id; every frame is ROWS-bounded and tie-broken."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last4 = w.rowsBetween(-3, Window.currentRow)
    scaled = F.floor(F.col("value") * SCALE)
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("seq"),
        (F.sum(scaled).over(cum).cast("double") / float(SCALE)).alias(
            "running_sum"
        ),
        # ts is TIMESTAMP_NTZ; timestamp_diff in micros is
        # timezone-independent, unlike unix_micros which would shift
        # under the driver's local-tz plain session.
        F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts")).alias(
            "gap_us"
        ),
        (
            F.sum(scaled).over(last4).cast("double")
            / float(SCALE)
            / F.count(F.lit(1)).over(last4)
        ).alias("moving_avg"),
    )


@query(
    "q_analytic_topn",
    f"""
    SELECT user_id, event_id, rnk, drnk
    FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(FLOOR(value * {SCALE}) AS BIGINT) DESC,
                            event_id)
    ) t WHERE rn <= 3
    """,
)
def q_analytic_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user by value with rank/dense_rank — the
    canonical top-N-per-group: one shuffle on the group key, a
    per-group sort, and a streamed row_number filter (never a global
    sort, never a per-group collect). Ordering on the floor-scaled
    BIGINT makes tie classes engine-identical."""
    e = load_table(spark, sf_dir, "events")
    key = F.floor(F.col("value") * SCALE).cast("long")
    w = Window.partitionBy("user_id").orderBy(key.desc(), "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_analytic_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity * {SCALE}) AS BIGINT))
                AS DOUBLE) / {SCALE}.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_analytic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: ROLLUP(returnflag, linestatus) with a
    grouping id distinguishing detail rows from subtotals from the
    grand total. Catalyst expands rollup to grouping sets inside ONE
    hash aggregate (map-side partial included) — no union of three
    scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("l_quantity") * SCALE)).cast("double")
            / float(SCALE)
        ).alias("sum_qty"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@query(
    "q_analytic_sessionize",
    f"""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER ({_ORDERED}) IS NULL
                       OR date_diff('microseconds',
                                    LAG(ts) OVER ({_ORDERED}),
                                    ts) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts, value,
             CAST(SUM(new_sess) OVER ({_ORDERED} ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           date_diff('microseconds', MIN(ts), MAX(ts)) AS duration_us,
           CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT)) AS DOUBLE)
             / {SCALE}.0 AS session_value
    FROM s
    GROUP BY user_id, session_id
    """,
)
def q_analytic_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-min inactivity): a session
    boundary is a lag-gap flag, the session id its per-user running
    sum — the classic two-window + one-aggregate composition. All
    three steps share ONE hash shuffle on user_id (the windows and the
    final groupBy partition by the same key, so Catalyst reuses the
    exchange); streaming twin is q_window_session."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_ts = F.lag("ts").over(w)
    gap = F.timestamp_diff("MICROSECOND", lag_ts, F.col("ts"))
    new_sess = F.when(
        lag_ts.isNull() | (gap > _SESSION_GAP_US), 1
    ).otherwise(0)
    sess = e.withColumn(
        "session_id", F.sum(new_sess).over(cum).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")).alias(
            "duration_us"
        ),
        (
            F.sum(F.floor(F.col("value") * SCALE)).cast("double")
            / float(SCALE)
        ).alias("session_value"),
    )


@query(
    "q_analytic_distribution",
    f"""
    SELECT user_id, event_id,
           NTILE(10) OVER w AS decile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS first_eid,
           LAST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS last_eid
    FROM events
    WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(FLOOR(value * {SCALE}) AS BIGINT), event_id)
    """,
)
def q_analytic_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution window functions: ntile deciles, percent_rank,
    cume_dist, and first/last value over the full partition. percent_
    rank/cume_dist are exact integer ratios divided once in IEEE —
    engine-identical; the order key is the floor-scaled BIGINT with an
    event_id tie-break so rank classes match exactly."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    key = F.floor(F.col("value") * SCALE).cast("long")
    w = Window.partitionBy("user_id").orderBy(key, "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("event_id").over(full).alias("first_eid"),
        F.last("event_id").over(full).alias("last_eid"),
    )


_HOUR_US = 3_600_000_000


@query(
    "q_analytic_timerange",
    f"""
    WITH t AS (
      SELECT user_id, event_id, ts, value,
             date_diff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts)
               AS us
      FROM events WHERE user_id < 30
    )
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT)) OVER w
                AS DOUBLE) / {SCALE}.0 AS sum_1h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    """,
)
def q_analytic_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range rolling aggregates: per user, count and exact sum of
    events in the trailing hour — a RANGE frame over an exact
    microsecond offset column (NTZ-safe: derived by timestamp_diff
    from a fixed literal epoch, no session-timezone dependence). RANGE
    on a numeric key is deterministic even with duplicate timestamps
    because the frame is value-bounded, not row-bounded. Same
    single-shuffle-per-key contract as every window here."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    t = e.withColumn("us", us)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    scaled = F.floor(F.col("value") * SCALE)
    return t.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (F.sum(scaled).over(w).cast("double") / float(SCALE)).alias("sum_1h"),
    )


@query(
    "q_analytic_global_rank",
    """
    SELECT rn, l_orderkey, l_linenumber FROM (
      SELECT CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                  AS BIGINT) AS rn,
             l_orderkey, l_linenumber
      FROM lineitem
    ) WHERE rn % 997 = 1
    """,
)
def q_analytic_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global row_number WITHOUT the single-partition window
    (operators/rank.py): range-repartition → local sort → bounded
    per-partition-count collect (numPartitions rows) → offset + dense
    local index. Bit-identical to `row_number() OVER (ORDER BY ...)`
    on the (l_orderkey, l_linenumber) total order, while every stage
    stays partition-parallel — the scale-correct form of the global
    ranking a curriculum/packing pipeline needs. The sparse rn
    checkpoints keep the compared result small at any SF."""
    from nutdb_spark.operators.rank import global_row_number

    d = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    ranked = global_row_number(
        d, ["l_orderkey", "l_linenumber"], out="rn"
    )
    return ranked.filter(F.col("rn") % 997 == 1).select(
        "rn", "l_orderkey", "l_linenumber"
    )


def _lttb_oracle(n: int) -> str:
    """LTTB replay as n-2 chained CTE steps: each step's carry (the
    last selected index) is a plain COLUMN, and the per-bucket argmax
    is list_position(areas, list_max(areas)) — NOT a struct-element
    list_reduce, which DuckDB 1.0 mis-threads under vectorized
    (multi-group) execution: per-group it answers correctly, batched
    the struct accumulator crosses rows (verified; the 8/25-groups
    failure disappears with this shape). The double-sum folds stay
    list_reduce over DOUBLE elements, which batch correctly and match
    Spark's in-order F.aggregate."""
    m = n - 2
    N = "len(cl)"

    def lo(i):
        return f"(2 + (({i} - 1) * ({N} - 2)) // {m})"

    def hi(i):
        return f"(1 + ({i} * ({N} - 2)) // {m})"

    ctes = ["s0 AS (SELECT *, CAST(1 AS BIGINT) AS li0 FROM g0)"]
    for i in range(1, m + 1):
        nlo = lo(i + 1) if i < m else N
        nhi = hi(i + 1) if i < m else N
        cx = (
            f"(list_reduce(list_concat([CAST(0 AS DOUBLE)],"
            f" list_transform(cl[{nlo}:{nhi}], p -> CAST(p.x AS DOUBLE))),"
            f" (a2,b2) -> a2 + b2) / ({nhi} - {nlo} + 1))"
        )
        cy = cx.replace("p.x", "p.y")
        ctes.append(
            f"c{i} AS (SELECT *, {cx} AS cx{i}, {cy} AS cy{i},"
            f" CAST(cl[li{i-1}].x AS DOUBLE) AS ax{i},"
            f" CAST(cl[li{i-1}].y AS DOUBLE) AS ay{i} FROM s{i-1})"
        )
        area = (
            f"abs((ax{i} - cx{i}) * (CAST(cl[j].y AS DOUBLE) - ay{i})"
            f" - (ax{i} - CAST(cl[j].x AS DOUBLE)) * (cy{i} - ay{i}))"
        )
        areas = f"list_transform(range({lo(i)}, {hi(i)} + 1), j -> {area})"
        am = f"({lo(i)} + list_position({areas}, list_max({areas})) - 1)"
        ctes.append(
            f"s{i} AS (SELECT *, CASE WHEN {N} <= {n} THEN 0 ELSE {am} END"
            f" AS li{i} FROM c{i})"
        )
    mid = "list_concat(" * (m - 1) + "[cl[li1]]" + "".join(
        f", [cl[li{i}]])" for i in range(2, m + 1)
    )
    sel = (
        f"CASE WHEN {N} <= {n} THEN cl"
        f" ELSE list_concat(list_concat(cl[1:1], {mid}), cl[{N}:{N}]) END"
    )
    return f"""
    WITH g0 AS (
      SELECT user_id, list_sort(list(
        {{'x': epoch_us(ts), 'y': CAST(floor(value * 100) AS BIGINT)}}))
        AS cl
      FROM events WHERE user_id < 12 GROUP BY user_id),
    {',' .join(ctes)}
    SELECT user_id,
           array_to_string(list_transform({sel},
             p -> CAST(p.x AS VARCHAR) || ':' || CAST(p.y AS VARCHAR)),
             '|') AS lt,
           CAST(len(cl) AS BIGINT) AS n_points
    FROM s{m} ORDER BY user_id
    """


@query("q_analytic_lttb", _lttb_oracle(10))
def q_analytic_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largestTriangleThreeBuckets(10) — LTTB downsampling of each
    user's (ts, value) series to 10 visually-representative points
    (endpoints kept; each bucket keeps the point forming the largest
    triangle with the previous selection and the next bucket's
    average). Exact cross-engine: integer inputs, integer-division
    bucket bounds, and area comparisons as a fixed double tree folded
    first-max-wins. Sequential by nature, so it folds in-order over
    one collected entity series — per-user groups keep state
    O(series), the fold-backed convention. The dashboard primitive
    for rendering billion-point series at pixel resolution."""
    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 12)
    lt = PARAMETRIC_AGGS["largestTriangleThreeBuckets"](
        [10],
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.floor(F.col("value") * 100).cast("long"),
    )
    return (
        e.groupBy("user_id")
        .agg(lt.alias("pts"), F.count(F.lit(1)).alias("n_points"))
        .select(
            "user_id",
            F.array_join(
                F.transform(
                    F.col("pts"),
                    lambda p: F.concat_ws(
                        ":", p["_1"].cast("string"), p["_2"].cast("string")
                    ),
                ),
                "|",
            ).alias("lt"),
            "n_points",
        )
    )


@query(
    "q_partition_pruning",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sv
    FROM events WHERE event_type = 'click'
    GROUP BY user_id
    """,
)
def q_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning — the first scan reducer at 100 TB: events
    are materialized ONCE as a hive-partitioned directory on
    event_type, and the event_type = 'click' read prunes to that one
    partition at PLANNING time (PartitionFilters in the scan,
    plan-pinned in tests/test_bucketed_join.py — the other types'
    files are never opened). Values equal the unpartitioned filter,
    which is what the oracle replays."""
    from nutdb_spark.operators.bucketing import ensure_partitioned

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value"), "event_type"
    )
    path = ensure_partitioned(spark, ev, sf_dir, "events", "event_type")
    return (
        spark.read.parquet(path)
        .filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sv"),
        )
    )


@query(
    "q_partition_pruning_dynamic",
    """
    WITH dim AS (
      SELECT DISTINCT event_type FROM events WHERE length(event_type) = 5)
    SELECT e.user_id, e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS sv
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.user_id, e.event_type
    """,
)
def q_partition_pruning_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime sibling of
    q_partition_pruning: the pruning predicate is not known at
    planning time (it comes out of a joined dimension's NON-partition
    filter, here length(event_type) = 5 → click/error), so Spark
    inserts a dynamicpruning subquery on the fact scan's partition
    column and reuses the dimension broadcast to evaluate it — only
    the matching partition directories are ever opened (plan-pinned
    in tests/test_bucketed_join.py). At 100 TB this is the
    star-schema scan reducer: the fact side prunes on a predicate
    that lives in the dimension. Values equal the plain join, which
    is what the oracle replays."""
    from nutdb_spark.operators.bucketing import ensure_partitioned

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value"), "event_type"
    )
    path = ensure_partitioned(spark, ev, sf_dir, "events", "event_type")
    fact = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .filter(F.length("event_type") == 5)
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sv"),
        )
        .select("user_id", "event_type", "n", "sv")
    )


_PD_NUM = """list_sum(list_transform(range(1, len(arr) - lv[1] + 1),
  t -> arr[t] * arr[t + lv[1]]))"""

_PD_FOLD = f"""list_reduce(
  [[CAST(-1 AS BIGINT), 1, 0]] ||
  list_transform(range(1, greatest(least(24, len(arr) - 1), 1) + 1),
                 l -> [l, 0, 0]),
  (acc, lv) -> CASE
    WHEN {_PD_NUM} * acc[2] > acc[1] * (len(arr) - lv[1])
    THEN [{_PD_NUM}, len(arr) - lv[1], lv[1]]
    ELSE acc END)"""


@query(
    "q_analytic_period",
    f"""
    WITH b AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT) AS bk
      FROM events WHERE user_id < 60),
    c AS (SELECT user_id, bk, CAST(COUNT(*) AS BIGINT) AS n
          FROM b GROUP BY user_id, bk),
    g AS (SELECT user_id, min(bk) AS mn, max(bk) AS mx,
                 list([bk, n]) AS pairs
          FROM c GROUP BY user_id),
    s AS (SELECT user_id,
                 list_transform(range(mn, mx + 1), k -> coalesce(
                   list_transform(list_filter(pairs, p -> p[1] = k),
                                  p -> p[2])[1], 0)) AS arr
          FROM g)
    SELECT user_id, CAST(len(arr) AS BIGINT) AS n_points,
           CASE WHEN len(arr) < 2 OR least(24, len(arr) - 1) < 1
                THEN NULL ELSE ({_PD_FOLD})[3] END AS period
    FROM s ORDER BY user_id
    """,
)
def q_analytic_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detection per user: events bucketed into dense
    6-hour count series (gaps zero-filled between each user's first
    and last active bucket), then seriesPeriodDetect — integer-exact
    autocorrelation argmax with per-lag length correction, lags
    compared by cross-multiplication so no float ever enters (CH's
    seriesPeriodDetectFFT is the float sibling; the raw-moment argmax
    is the same argmax for non-negative count series). One groupBy to
    the per-user series, then an O(maxlag·L) projection — per-entity
    state only, no second shuffle."""
    from nutdb_spark.functions.registry import SCALAR_FNS

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    per = (
        ev.select(
            "user_id",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(21600000000)
            ).cast(
                "long"
            ).alias("bk"),
        )
        .groupBy("user_id", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = per.groupBy("user_id").agg(
        F.min("bk").alias("mn"),
        F.max("bk").alias("mx"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bk"), F.col("n")))
        ).alias("m"),
    )
    arr = F.transform(
        F.sequence(F.col("mn"), F.col("mx")),
        lambda k: F.coalesce(
            F.element_at(F.col("m"), k), F.lit(0).cast("long")
        ),
    )
    return g.select(
        "user_id",
        F.size(arr).cast("long").alias("n_points"),
        SCALAR_FNS["seriesPeriodDetect"](arr, F.lit(24)).alias("period"),
    ).orderBy("user_id")


@query(
    "q_layout_compaction",
    """
    WITH manifest AS (
      SELECT event_type AS part, event_id AS file_id,
             CAST(floor(value * 1000) + 1 AS BIGINT) AS bytes
      FROM events),
    planned AS (
      SELECT part, file_id, bytes,
             CAST(floor(CAST(SUM(bytes) OVER (PARTITION BY part
                    ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) - bytes AS DOUBLE)
                  / 5000000.0) AS BIGINT) AS grp
      FROM manifest)
    SELECT part, grp, COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS grp_bytes
    FROM planned GROUP BY part, grp
    """,
)
def q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the lakehouse OPTIMIZE
    maintenance step at manifest level: a synthetic file manifest
    (one "file" per event, sized from its value) is assigned to
    output groups by the deterministic sequential first-fit rule
    group = floor((cumsum − size) / target), so every group holds
    ≤ 5 MB plus at most one straddling file and the plan is
    reproducible across engines (file-id order). One window cumsum
    per partition — manifests are file-count-sized even at 100 TB —
    then the group rollup the rewrite jobs consume."""
    from nutdb_spark.operators.bucketing import (
        compaction_summary,
        plan_compaction,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.col("event_id"),
        (F.floor(F.col("value") * 1000) + 1).cast("long").alias("bytes"),
    )
    plan = plan_compaction(
        ev, "event_type", "event_id", "bytes", target_bytes=5_000_000
    )
    return compaction_summary(plan)


@query(
    "q_pack_efficiency",
    """
    WITH manifest AS (
      SELECT lang AS part, doc_id,
             CAST(greatest(n_chars // 4, 1) AS BIGINT) AS toks
      FROM documents),
    planned AS (
      SELECT part, doc_id, toks,
             CAST(floor(CAST(SUM(toks) OVER (PARTITION BY part
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) - toks AS DOUBLE)
                  / 2048.0) AS BIGINT) AS grp
      FROM manifest),
    bins AS (
      SELECT part, grp, CAST(SUM(toks) AS BIGINT) AS fill
      FROM planned GROUP BY part, grp)
    SELECT part, COUNT(*) AS n_bins,
           CAST(SUM(fill) AS BIGINT) AS total_toks,
           CAST(SUM(fill) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 2048.0) AS fill_rate
    FROM bins GROUP BY part
    """,
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing QA — the report that decides whether a corpus
    needs repacking before training: documents (token counts ≈
    chars/4, min 1) run through the deterministic sequential
    first-fit planner (plan_compaction with a 2048-token context as
    the bin target, per language) and roll up to bins / total tokens
    / fill rate per language. Fill rate is ONE double division over
    exact int64 sums — hash-oracled. Same scale shape as the
    compaction planner: one window cumsum per partition."""
    from nutdb_spark.operators.bucketing import plan_compaction

    d = load_table(spark, sf_dir, "documents").select(
        F.col("lang"),
        F.col("doc_id"),
        F.greatest(
            F.floor(F.col("n_chars") / 4).cast("long"), F.lit(1)
        ).alias("toks"),
    )
    plan = plan_compaction(d, "lang", "doc_id", "toks", target_bytes=2048)
    bins = plan.groupBy("part", "grp").agg(F.sum("bytes").alias("fill"))
    return bins.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").cast("long").alias("total_toks"),
        F.try_divide(
            F.sum("fill").cast("double"),
            (F.count(F.lit(1)) * 2048).cast("double"),
        ).alias("fill_rate"),
    )


# --- [EXT] link-graph centrality (PageRank) ----------------------------------

from nutdb_spark.operators.graph import oracle_pagerank_sql  # noqa: E402

_PR_EDGES = """
    SELECT CAST(doc_id AS BIGINT) AS src,
           CAST((doc_id * 31 + 97 * j.j)
                % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
    FROM documents, (SELECT unnest([1, 2, 3]) AS j) j
    WHERE (doc_id * 31 + 97 * j.j)
          % (SELECT COUNT(*) FROM documents) != doc_id
"""
_PR_NODES = "SELECT CAST(doc_id AS BIGINT) AS id FROM documents"


@query(
    "q_graph_pagerank",
    oracle_pagerank_sql(_PR_EDGES, _PR_NODES, iters=8)
    + " ORDER BY id",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Link-graph centrality — exact integer-scaled PageRank
    (operators/graph.py), the Common-Crawl-style quality signal (keep
    pages that well-linked pages link to) and the centrality half of
    the graph story next to connected components. Ranks are int64 in
    units of 1e-12 and every step is div/sum/div integer arithmetic,
    so 8 iterations hash-match DuckDB's unrolled replay exactly —
    float PageRank cannot be value-oracled. The fixture has no
    organic hyperlinks, so a deterministic 3-out-link graph is
    synthesized over doc_ids (the q_text_pii precedent); the operator
    is the real thing: per iteration one equi-join of the N-row rank
    vector against the edge list + one groupBy on dst, a fixed-count
    lazy unrolled plan. At 100 TB the edge list partitions on src
    once and is reused by every iteration; the rank vector stays
    node-sized."""
    from nutdb_spark.operators.graph import pagerank

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id")
    )
    n = d.count()  # 1-row bounded action: N is a spec constant
    dsts = [
        ((F.col("id") * 31 + 97 * j) % n).cast("long") for j in (1, 2, 3)
    ]
    edges = (
        d.select(F.col("id").alias("src"), F.explode(F.array(*dsts)).alias("dst"))
        .where(F.col("dst") != F.col("src"))
    )
    return pagerank(edges, d, iters=8, n_nodes=n).orderBy("id")


_PR_FN_EDGES = """
    SELECT CAST(doc_id AS BIGINT) AS src,
           CAST((doc_id * 31 + 97 * (j.j + 1))
                % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
    FROM documents, (SELECT unnest([0, 1, 2]) AS j) j
    WHERE (doc_id * 31 + 97 * (j.j + 1))
          % (SELECT COUNT(*) FROM documents) != doc_id
"""
_PR_FN_NODES = (
    "SELECT DISTINCT src AS id FROM __edges "
    "UNION SELECT DISTINCT dst FROM __edges"
)


@query(
    "sql_table_fn_pagerank",
    oracle_pagerank_sql(_PR_FN_EDGES, _PR_FN_NODES, iters=6)
    + " ORDER BY id",
)
def sql_table_fn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] graph centrality at the SQL surface:
    pageRank('pr_edges', 'src', 'dst', 6) runs the exact integer
    PageRank as a TABLE FUNCTION (operators/graph.py under the hood —
    q_graph_pagerank's plan, reachable from pure dialect text; nodes
    are the distinct edge endpoints). The edge table is built by a
    dialect CTAS from the same deterministic 3-out-link synthesis,
    proving scalar-subquery N, CROSS JOIN numbers() and the fn
    compose end-to-end."""
    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark, data_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS pr_edges")
    eng.sql(
        """
        CREATE TABLE pr_edges AS
        SELECT doc_id AS src,
               (doc_id * 31 + 97 * (number + 1))
                 % (SELECT count(*) FROM documents) AS dst
        FROM documents CROSS JOIN numbers(3)
        WHERE (doc_id * 31 + 97 * (number + 1))
              % (SELECT count(*) FROM documents) != doc_id
        """
    )
    return eng.sql(
        "select id, rank from pageRank('pr_edges', 'src', 'dst', 6) "
        "order by id"
    )


from nutdb_spark.operators.graph import oracle_triangles_sql  # noqa: E402


@query(
    "q_graph_triangles",
    oracle_triangles_sql(_PR_EDGES, _PR_NODES) + " ORDER BY id",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact per-node triangle counts — the clustering-signal
    half of the graph story (spam/link-farm detection ranks pages by
    local clustering; PageRank ranks by centrality). Degree
    orientation bounds the wedge join's fan-out at O(sqrt(m)) per
    node on power-law graphs — the classic trick that makes exact
    triangle enumeration survive hubs at 100 TB; two equi-joins, no
    cartesian (plan-pinned). Same synthesized 3-out-link graph as
    q_graph_pagerank; counts are exact ints so the oracle is
    bit-identical."""
    from nutdb_spark.operators.graph import triangle_count

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id")
    )
    n = d.count()  # 1-row bounded action (graph-synthesis modulus)
    dsts = [
        ((F.col("id") * 31 + 97 * j) % n).cast("long") for j in (1, 2, 3)
    ]
    edges = (
        d.select(
            F.col("id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
        )
        .where(F.col("dst") != F.col("src"))
    )
    return triangle_count(edges, d).orderBy("id")


@query(
    "sql_table_fn_triangles",
    oracle_triangles_sql(_PR_FN_EDGES, _PR_FN_NODES) + " ORDER BY id",
)
def sql_table_fn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] triangle counting at the SQL surface:
    triangles('tri_edges', 'src', 'dst') runs the degree-oriented
    exact enumeration as a TABLE FUNCTION (q_graph_triangles' plan
    from pure dialect text; nodes = distinct endpoints)."""
    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark, data_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS tri_edges")
    eng.sql(
        """
        CREATE TABLE tri_edges AS
        SELECT doc_id AS src,
               (doc_id * 31 + 97 * (number + 1))
                 % (SELECT count(*) FROM documents) AS dst
        FROM documents CROSS JOIN numbers(3)
        WHERE (doc_id * 31 + 97 * (number + 1))
              % (SELECT count(*) FROM documents) != doc_id
        """
    )
    return eng.sql(
        "select id, tri from triangles('tri_edges', 'src', 'dst') "
        "order by id"
    )


# --- [EXT] interval-overlap join (the range-join class) ----------------------

_IV_HR = 3_600_000_000  # 1 hour in µs
_IV_W6 = 21_600_000_000  # 6 hours in µs


@query(
    "q_join_interval",
    f"""
    WITH u AS (
      SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
      FROM events),
    a AS (SELECT user_id, us // {_IV_HR} AS hr,
                 MIN(us) AS a_start, MAX(us) AS a_end
          FROM u GROUP BY 1, 2),
    b AS (SELECT event_type, us // {_IV_W6} AS w,
                 MIN(us) AS b_start, MAX(us) AS b_end
          FROM u GROUP BY 1, 2),
    j AS (SELECT user_id, event_type,
                 GREATEST(a_start, b_start) AS os,
                 LEAST(a_end, b_end) AS oe
          FROM a JOIN b ON a_start <= b_end AND b_start <= a_end)
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(oe - os) AS BIGINT) AS overlap_us
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Interval-overlap join (the range-join class Spark's
    equi-join can't express directly): per-user hourly activity
    intervals × per-type 6-hour activity windows, all overlapping
    pairs, rolled up to overlap count + total overlapped µs per
    (user, type). The operator buckets time and anchors each pair to
    the unique bucket holding the later start (operators/interval.py)
    — an equi-join over exploded buckets, never a theta-join; the
    ORACLE is the brute-force quadratic join, so the values prove the
    bucketing loses and duplicates nothing (the q_geo_bucket_join
    precedent, in time). Plan-pinned no-cartesian."""
    from nutdb_spark.operators.interval import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    a = (
        ev.select(
            "user_id", us.alias("us"), F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_IV_HR}"
            ).alias("hr")
        )
        .groupBy("user_id", "hr")
        .agg(F.min("us").alias("a_start"), F.max("us").alias("a_end"))
        .select("user_id", "a_start", "a_end")
    )
    b = (
        ev.select(
            "event_type", us.alias("us"), F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_IV_W6}"
            ).alias("w")
        )
        .groupBy("event_type", "w")
        .agg(F.min("us").alias("b_start"), F.max("us").alias("b_end"))
        .select("event_type", "b_start", "b_end")
    )
    j = interval_overlap_join(a, b, bucket=_IV_HR)
    return (
        j.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).cast("long").alias("overlap_us"),
        )
        .orderBy("user_id", "event_type")
    )


# --- [EXT] round-13: Z-order layout clustering --------------------------------

_Z_BITS = 8  # per-dimension bucket width
_Z_FILES = 64
# boxes in BUCKET space [0, 256): each linear layout should win only
# its own dimension; z-order prunes on both
_Z_BOXES = (
    ("cust_narrow", (0, 31), (0, 255)),
    ("date_narrow", (0, 255), (0, 31)),
    ("both_narrow", (0, 63), (0, 63)),
)


def _zorder_oracle() -> str:
    from nutdb_spark.operators.layout import (
        oracle_dim_bucket,
        oracle_layout_prune,
        oracle_zorder_key,
    )

    xb = oracle_dim_bucket("o_custkey", "st.minx", "st.maxx", bits=_Z_BITS)
    yb = oracle_dim_bucket("dy", "st.miny", "st.maxy", bits=_Z_BITS)
    rows = f"""
    SELECT {xb} AS xb, {yb} AS yb
    FROM (SELECT o_custkey,
                 date_diff('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE)) AS dy
          FROM orders) o, st"""
    selects = []
    for box_name, bx, by in _Z_BOXES:
        for layout, key, kb in (
            ("linear_cust", "xb", _Z_BITS),
            ("linear_date", "yb", _Z_BITS),
            ("zorder", oracle_zorder_key("xb", "yb", bits=_Z_BITS),
             2 * _Z_BITS),
        ):
            selects.append(
                oracle_layout_prune(
                    "SELECT * FROM rows_m",
                    key,
                    layout=layout,
                    key_bits=kb,
                    n_files=_Z_FILES,
                    box_x=bx,
                    box_y=by,
                    box_name=box_name,
                )
            )
    union = "\nUNION ALL\n".join(selects)
    return f"""
    WITH st AS MATERIALIZED (
      SELECT MIN(o_custkey) AS minx, MAX(o_custkey) AS maxx,
             MIN(date_diff('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE))) AS miny,
             MAX(date_diff('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE))) AS maxy
      FROM orders),
    rows_m AS MATERIALIZED ({rows})
    SELECT * FROM ({union})
    ORDER BY layout, box"""


@query("q_layout_zorder", _zorder_oracle())
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Z-order layout clustering, measured (operators/layout.py):
    bucketize orders on (customer, order day), assign rows to 64
    equal-key-range 'files' under three sort layouts — customer-sorted,
    date-sorted, Morton-interleaved — and count the files (and rows) a
    min/max-stats-pruned scan must read for three box predicates. Each
    linear layout prunes only its own dimension (its cross dimension
    reads ~all files); z-order prunes on BOTH — the lakehouse
    OPTIMIZE ZORDER BY claim as a replayable integer computation. At
    scale the file assignment is exactly a repartitionByRange(zkey) +
    sorted write, and the per-file min/max table IS the skipping
    index."""
    from nutdb_spark.operators.layout import (
        dim_bucket,
        layout_prune_stats,
        zorder_key,
    )

    o = load_table(spark, sf_dir, "orders")
    dy = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
    )
    stats = o.agg(
        F.min("o_custkey").alias("minx"),
        F.max("o_custkey").alias("maxx"),
        F.min(dy).alias("miny"),
        F.max(dy).alias("maxy"),
    )
    rows = (
        o.select(F.col("o_custkey").alias("__x"), dy.alias("__y"))
        .crossJoin(F.broadcast(stats))
        .select(
            dim_bucket(
                F.col("__x"), F.col("minx"), F.col("maxx"), bits=_Z_BITS
            ).alias("xb"),
            dim_bucket(
                F.col("__y"), F.col("miny"), F.col("maxy"), bits=_Z_BITS
            ).alias("yb"),
        )
    )
    parts = []
    for box_name, bx, by in _Z_BOXES:
        for layout, key, kb in (
            ("linear_cust", F.col("xb"), _Z_BITS),
            ("linear_date", F.col("yb"), _Z_BITS),
            (
                "zorder",
                zorder_key(F.col("xb"), F.col("yb"), bits=_Z_BITS),
                2 * _Z_BITS,
            ),
        ):
            parts.append(
                layout_prune_stats(
                    rows,
                    key,
                    layout=layout,
                    key_bits=kb,
                    n_files=_Z_FILES,
                    box_x=bx,
                    box_y=by,
                    box_name=box_name,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("layout", "box")
