"""Per-function correctness queries: the §2.5 dialect function surface.

Every function name pinned by the reference corpus gets a suite entry
lowering through nutdb_spark.functions.registry — the same registry the
SQL frontend resolves `fn(args)` calls against, so a green row here
covers both the DataFrame path and the dialect name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import AGGREGATE_FNS, SCALAR_FNS
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

# --- min / max / count(col) (corpus 6.sql:20) -----------------------------


@query(
    "q_fn_minmax",
    """
    SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
           COUNT(l_orderkey) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        AGGREGATE_FNS["min"]("l_quantity").alias("min_qty"),
        AGGREGATE_FNS["max"]("l_quantity").alias("max_qty"),
        AGGREGATE_FNS["min"]("l_shipdate").alias("first_ship"),
        AGGREGATE_FNS["max"]("l_shipdate").alias("last_ship"),
        AGGREGATE_FNS["count"](F.col("l_orderkey")).alias("n"),
    )


# --- countUnique (corpus 7.sql:5) → exact count_distinct ------------------


@query(
    "q_fn_count_unique",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS uniq_supp,
           COUNT(DISTINCT l_partkey) AS uniq_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_count_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        AGGREGATE_FNS["countUnique"](F.col("l_suppkey")).alias("uniq_supp"),
        AGGREGATE_FNS["countUnique"](F.col("l_partkey")).alias("uniq_part"),
    )


# --- substring (corpus 9.sql:8,13; 1-based) -------------------------------


@query(
    "q_fn_substring",
    """
    SELECT c_custkey,
           substring(c_name, 1, 8) AS prefix,
           substring(c_name, 10, 4) AS digits
    FROM customer WHERE c_custkey < 200
    """,
)
def q_fn_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    sub = SCALAR_FNS["substring"]
    return c.select(
        "c_custkey",
        sub(F.col("c_name"), F.lit(1), F.lit(8)).alias("prefix"),
        sub(F.col("c_name"), F.lit(10), F.lit(4)).alias("digits"),
    )


# --- toDate / getYear / toYYYYMMDD (corpus 1.sql:15, 3.sql:11, 10.sql:6) --


@query(
    "q_fn_dates",
    """
    SELECT year(o_orderdate) AS yr,
           CAST(strftime(min(o_orderdate), '%Y%m%d') AS INT) AS first_day,
           CAST(strftime(max(o_orderdate), '%Y%m%d') AS INT) AS last_day,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY yr
    """,
)
def q_fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getYear → F.year; toYYYYMMDD → date_format yyyyMMdd cast int;
    toDate('1996-01-01') comparison pushed in timestamp domain."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    get_year = SCALAR_FNS["getYear"]
    yyyymmdd = SCALAR_FNS["toYYYYMMDD"]
    return o.groupBy(get_year(F.col("o_orderdate")).alias("yr")).agg(
        F.min(yyyymmdd(F.col("o_orderdate"))).alias("first_day"),
        F.max(yyyymmdd(F.col("o_orderdate"))).alias("last_day"),
        F.count(F.lit(1)).alias("n"),
    )


# --- scalar string/misc registry names ------------------------------------


@query(
    "q_fn_strings",
    """
    SELECT p_partkey,
           lower(p_brand) AS lo, upper(p_name) AS up,
           length(p_name) AS len, round(p_retailprice, 1) AS rp,
           coalesce(nullif(p_type, 'PROMO'), 'regular') AS ty,
           abs(p_size - 25) AS dist
    FROM part WHERE p_partkey < 200
    """,
)
def q_fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    s = SCALAR_FNS
    return p.select(
        "p_partkey",
        s["lower"](F.col("p_brand")).alias("lo"),
        s["upper"](F.col("p_name")).alias("up"),
        s["length"](F.col("p_name")).alias("len"),
        s["round"](F.col("p_retailprice"), 1).alias("rp"),
        s["coalesce"](
            s["nullIf"](F.col("p_type"), F.lit("PROMO")), F.lit("regular")
        ).alias("ty"),
        s["abs"](F.col("p_size") - 25).alias("dist"),
    )


# --- random() (corpus 14.sql:15) — nondeterministic, rows-only check ------


@query("q_fn_random")  # no oracle: nondeterministic by definition
def q_fn_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random() ∈ [0,1): validate the bound distributed-side; the driver
    records a rows-only check (1 row, all_in_range=true)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = SCALAR_FNS["random"]()
    return li.select(((r >= 0) & (r < 1)).alias("ok")).agg(
        F.min("ok").alias("all_in_range"), F.count(F.lit(1)).alias("n")
    )


# --- quantile / median (exact interpolated; ClickHouse-family names) ------


@query(
    "q_fn_quantile",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS med_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles — bit-identical to DuckDB's
    quantile_cont given identical inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        AGGREGATE_FNS["median"](F.col("l_quantity")).alias("med_qty"),
        AGGREGATE_FNS["quantile"](F.col("l_extendedprice"), 0.9).alias("p90_price"),
    )


@query(
    "q_fn_quantile_approx",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS med_qty,
           quantile_disc(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path: `quantileApprox` (F.percentile_approx,
    Greenwald-Khanna sketch — constant memory per group, mergeable
    map-side partials) instead of `quantile`'s exact per-group sort
    state. At full accuracy the sketch degrades gracefully to exact
    rank selection, returning an actual data element — identical to
    DuckDB's discrete quantile, which the oracle uses. Production use
    at scale drops `accuracy` to the default 10000 and accepts the
    epsilon-rank error; semantics (discrete element selection) are
    unchanged, which is what this entry pins down.
    Reference anchor: open FnName::Others namespace
    (/root/reference/src/parser/ast/item.rs:178)."""
    li = load_table(spark, sf_dir, "lineitem")
    qa = AGGREGATE_FNS["quantileApprox"]
    return li.groupBy("l_returnflag").agg(
        qa(F.col("l_quantity"), 0.5, 1_000_000).alias("med_qty"),
        qa(F.col("l_extendedprice"), 0.9, 1_000_000).alias("p90_price"),
    )


# --- ClickHouse-family surface (round 5): datetime / conditional aggs /
# string+math scalars, each reached THROUGH THE DIALECT FRONTEND so the
# open FnName::Others namespace resolution is what's certified ----------


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir).sql(text)


# DuckDB reads events.ts as TIMESTAMP_NS; normalize like streaming_suite.
_EV = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


@query(
    "q_fn_datetime",
    f"""
    SELECT event_id,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS mstart,
           date_trunc('hour', ts) AS hstart,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS dom,
           CAST(isodow(ts) AS INT) AS dow,
           CAST(quarter(ts) AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS ut,
           CAST(hour(ts) AS INT) AS h,
           ts + INTERVAL 2 DAY AS plus2d,
           ts + INTERVAL 3 HOUR AS plus3h
    FROM {_EV} e WHERE event_id < 500
    """,
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse datetime surface: toStartOfMonth/Hour, toMonth,
    toDayOfMonth, toDayOfWeek (ISO Monday=1), toHour, addDays/addHours
    — all date_trunc/extract builtins, codegen-side."""
    return _sql(
        spark,
        sf_dir,
        """
        select event_id,
               toStartOfMonth(ts) as mstart,
               toStartOfHour(ts) as hstart,
               toMonth(ts) as m,
               toDayOfMonth(ts) as dom,
               toDayOfWeek(ts) as dow,
               toQuarter(ts) as q,
               toDayOfYear(ts) as doy,
               toUnixTimestamp(ts) as ut,
               toHour(ts) as h,
               addDays(ts, 2) as plus2d,
               addHours(ts, 3) as plus3h
        from events where event_id < 500
        """,
    )


@query(
    "q_fn_conditional_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(FLOOR(l_quantity * 10000) AS BIGINT) END)
                AS BIGINT) AS qty_hidisc,
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           MIN(CASE WHEN l_linenumber = 1 THEN l_shipdate END) AS first_l1,
           arg_max(l_partkey, l_orderkey * 10 + l_linenumber) AS last_part,
           COUNT(DISTINCT l_suppkey) AS uniq_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse conditional/positional aggregates: sumIf, countIf,
    minIf, argMax (max_by on a unique composite), uniqExact — all
    single-pass, map-side-partial JVM aggregates (the -If family is a
    CASE inside the agg, never a second scan)."""
    return _sql(
        spark,
        sf_dir,
        """
        select l_returnflag,
               sumIf(floor(l_quantity * 10000), l_discount > 0.05) as qty_hidisc,
               countIf(l_quantity > 25) as n_bulk,
               minIf(l_shipdate, l_linenumber = 1) as first_l1,
               argMax(l_partkey, l_orderkey * 10 + l_linenumber) as last_part,
               uniqExact(l_suppkey) as uniq_supp
        from lineitem group by l_returnflag
        """,
    )


@query(
    "q_fn_scalar_surface",
    """
    SELECT p_partkey,
           trim(p_name) AS t,
           starts_with(p_name, 'red') AS is_red,
           ends_with(p_name, 'bolt') AS is_bolt,
           strpos(p_name, 'e') AS pos_e,
           reverse(p_brand) AS rb,
           repeat(p_brand, 2) AS rb2,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           greatest(p_size, 25) AS hi,
           least(p_size, 25) AS lo,
           CAST(pow(2, p_size % 10) AS DOUBLE) AS p2,
           CAST(sign(p_size - 25) AS DOUBLE) AS sg
    FROM part WHERE p_partkey < 300
    """,
)
def q_fn_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse string/math scalars through the frontend: trim,
    startsWith/endsWith, position, reverse, repeat, leftPad,
    greatest/least, pow (exact powers of two), sign."""
    return _sql(
        spark,
        sf_dir,
        """
        select p_partkey,
               trim(p_name) as t,
               startsWith(p_name, 'red') as is_red,
               endsWith(p_name, 'bolt') as is_bolt,
               position(p_name, 'e') as pos_e,
               reverse(p_brand) as rb,
               repeat(p_brand, 2) as rb2,
               leftPad(concat('', p_size), 4, '0') as padded,
               greatest(p_size, 25) as hi,
               least(p_size, 25) as lo,
               pow(2, p_size % 10) as p2,
               sign(p_size - 25) as sg
        from part where p_partkey < 300
        """,
    )


# --- round-6 late function batch: datetime/string/array/agg tier 2 --------


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir).sql(text)


@query(
    "q_fn_datetime2",
    """
    SELECT o_orderkey,
           date_diff('day', date_trunc('week', o_orderdate), o_orderdate)
             AS dow_idx,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS mon,
           o_orderdate + INTERVAL 14 DAY AS plus2w,
           o_orderdate - INTERVAL 1 MONTH AS minus1m,
           o_orderdate + INTERVAL 90 MINUTE AS plus90m
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dateDiff / toStartOfWeek / toMonday / add-subtract interval tier:
    date_trunc('week') is Monday-start in BOTH Spark and DuckDB, and
    calendar month arithmetic clamps end-of-month identically, so every
    column oracles exactly. dateDiff's unit is a compile-time string
    literal (Spark timestampdiff takes no unit Column)."""
    return _sql(
        spark,
        sf_dir,
        """
        select o_orderkey,
               dateDiff('day', toStartOfWeek(o_orderdate), o_orderdate)
                 as dow_idx,
               toMonday(o_orderdate) as mon,
               addWeeks(o_orderdate, 2) as plus2w,
               subtractMonths(o_orderdate, 1) as minus1m,
               addMinutes(o_orderdate, 90) as plus90m
        from orders where o_orderkey < 200
        """,
    )


@query(
    "q_fn_scalar_surface2",
    """
    SELECT left(text, 4) AS l4,
           right(text, 3) AS r3,
           concat_ws('-', lang, source) AS tag,
           CASE WHEN n_chars < 500 THEN 'low'
                WHEN n_chars < 2000 THEN 'mid' ELSE 'high' END AS band,
           COALESCE(NULLIF(lang, 'en'), 'x') AS lg,
           doc_id // 7 AS q7,
           doc_id % 7 AS m7,
           md5(lang) AS h,
           sha256(source) AS h2,
           regexp_extract(text, '[a-z]{5,}') AS w5,
           regexp_matches(text, 'ab') AS has_ab,
           length(text) > 0 AS ne
    FROM documents WHERE doc_id < 200
    """,
)
def q_fn_scalar_surface2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/conditional/hash tier 2: left/right, concatWithSeparator,
    multiIf, ifNull∘nullIf, intDiv+modulo (toward-zero == floor on the
    non-negative keys used here; engines differ on negatives —
    documented in the registry), MD5/SHA256 (cross-engine standard
    digests), extract + match (regex, group-0 semantics shared with
    DuckDB), notEmpty."""
    return _sql(
        spark,
        sf_dir,
        """
        select left(text, 4) as l4,
               right(text, 3) as r3,
               concatWithSeparator('-', lang, source) as tag,
               multiIf(n_chars < 500, 'low',
                       n_chars < 2000, 'mid', 'high') as band,
               ifNull(nullIf(lang, 'en'), 'x') as lg,
               intDiv(doc_id, 7) as q7,
               modulo(doc_id, 7) as m7,
               MD5(lang) as h,
               SHA256(source) as h2,
               extract(text, '[a-z]{5,}') as w5,
               match(text, 'ab') as has_ab,
               notEmpty(text) as ne
        from documents where doc_id < 200
        """,
    )


@query(
    "q_fn_arrays",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 120)
    SELECT doc_id,
           CAST(len(list_concat(toks, toks)) AS INT) AS n2,
           CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT)
             AS pos_the,
           array_to_string(toks[1:3], ' ') AS head3,
           array_to_string(list_reverse(toks[1:3]), ' ') AS rev3,
           CAST(list_min(list_transform(toks, x -> length(x))) AS INT)
             AS minlen,
           CAST(list_max(list_transform(toks, x -> length(x))) AS INT)
             AS maxlen,
           CAST(len(toks) AS INT) AS n_enum,
           CAST(FLOOR(list_avg(list_transform(toks, x -> length(x)))
                      * 1000) AS BIGINT) AS avglen_m
    FROM d
    """,
)
def q_fn_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface tier 2: arrayConcat/Slice/Reverse/Min/Max/Avg,
    indexOf (0 when absent, both engines via COALESCE), arrayEnumerate
    (empty-array guarded — Spark sequence(1,0) would run DOWNWARD),
    arrayStringConcat. Everything stays a JVM higher-order expression;
    scalar outputs only (array cells avoided in the driver compare)."""
    return _sql(
        spark,
        sf_dir,
        """
        select doc_id,
               arrayLength(arrayConcat(toks, toks)) as n2,
               indexOf(toks, 'the') as pos_the,
               arrayStringConcat(arraySlice(toks, 1, 3), ' ') as head3,
               arrayStringConcat(arrayReverse(arraySlice(toks, 1, 3)), ' ')
                 as rev3,
               arrayMin(arrayMap(x -> length(x), toks)) as minlen,
               arrayMax(arrayMap(x -> length(x), toks)) as maxlen,
               arrayLength(arrayEnumerate(toks)) as n_enum,
               floor(arrayAvg(arrayMap(x -> length(x), toks)) * 1000)
                 as avglen_m
        from (select doc_id, splitByChar(' ', text) as toks
              from documents where doc_id < 120) as d
        """,
    )


@query(
    "q_fn_agg_surface2",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
             AS statuses,
           quantile_cont(l_quantity, 0.5) AS med,
           bit_and(l_linenumber) AS b_and,
           bit_or(l_linenumber) AS b_or,
           bit_xor(l_linenumber) AS b_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_agg_surface2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate tier 2: groupUniqArray (collect_set SORTED — the
    deterministic, engine-portable strengthening of ClickHouse's
    undefined order, stringified for the scalar-only compare),
    quantiles(...)  plural indexed back to its median element, and the
    bit-reduction aggregates. All map-side-partial JVM aggregates."""
    return _sql(
        spark,
        sf_dir,
        """
        select l_returnflag,
               arrayStringConcat(groupUniqArray(l_linestatus), ',')
                 as statuses,
               quantiles(l_quantity, 0.25, 0.5, 0.75)[2] as med,
               groupBitAnd(l_linenumber) as b_and,
               groupBitOr(l_linenumber) as b_or,
               groupBitXor(l_linenumber) as b_xor
        from lineitem group by l_returnflag
        """,
    )
