"""Repaired TPC-H-shaped end-to-end queries.

The reference's SQL corpus (`/root/reference/tests/sql/1-9.sql`) is
"grammatically correct only" (`tests/sql/README.md:1-3`): the TPC-H
shapes carry free variables and implicit joins over tables absent from
FROM. Per SURVEY.md §5, each query here is the corpus shape repaired
into an executable query over the driver fixtures (FIXTURES.md), with
the repair documented in the docstring.

All float aggregates use the deterministic decimal-sum convention from
``nutdb_spark.functions.exact`` on BOTH the Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.functions.exact import davg, dsum, oracle_davg, oracle_dsum
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

# --------------------------------------------------------------------------
# Q1 — pricing summary (corpus 1.sql, reference tests/sql/1.sql:1-29).
# Repair: dropped the partsupp/supplier/nation/region free variables
# (p_partkey, ps_partkey, s_suppkey, s_nationkey, r_name, s_acctbal) —
# they belong to other TPC-H queries mangled into the same file — leaving
# the canonical single-table Q1: filter → groupBy → agg → orderBy.
# Scale notes: single scan, partial+final hash agg (map-side combine) on a
# 4-group key, no join, no shuffle beyond the tiny agg exchange. The
# l_shipdate filter compares in the column's native timestamp domain
# (fixtures are midnight-aligned, so DATE-cast semantics are identical) —
# a cast on the scan column would block parquet predicate pushdown; this
# form reaches the scan as a PushedFilter (verified via explain).
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity')} AS sum_qty,
  {oracle_dsum('l_extendedprice')} AS sum_base_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {oracle_davg('l_quantity')} AS avg_qty,
  {oracle_davg('l_extendedprice')} AS avg_price,
  {oracle_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-11-21 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("tpch_q1", _Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-11-21 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

# --------------------------------------------------------------------------
# Corpus 2.sql (TPC-H Q4 shape, reference tests/sql/2.sql).
# Repairs: l_commitdate/l_receiptdate absent from fixtures → the EXISTS
# predicate becomes "shipped >2 months after order" (l_shipdate >
# o_orderdate + INTERVAL 2 MONTH); date window moved into the fixture's
# 1995-2001 o_orderdate range.
# Scale: orders scan with a pushed date-range filter; EXISTS lowers to a
# left-semi join on l_orderkey (shuffle on the key, AQE-coalesced).
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 2 MONTH)
GROUP BY o_orderpriority
"""


@query("tpch_q4", _Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 2 MONTHS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Corpus 3.sql (TPC-H Q7 shape). Repairs: implicit joins made explicit;
# FRANCE/GERMANY → fixture nations NATION_1/NATION_2; getYear → year().
# Scale: both nation dims broadcast; the two fact joins shuffle on their
# keys; the nation-pair OR filter prunes before the year aggregation.
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7", _Q7_ORACLE)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2")
    ) | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(volume, "revenue"))
    )


# --------------------------------------------------------------------------
# Corpus 4.sql (TPC-H Q11 shape). Repairs: no partsupp fixture → value
# reconstructed from lineitem (l_extendedprice * l_quantity) joined to
# supplier/nation; GERMANY → NATION_3; threshold 0.0001 → 0.001 so the
# HAVING keeps rows at fixture scale.
# Scale: the scalar subquery is a 1-row aggregate broadcast into the
# HAVING filter — the grouped relation is computed once per side but
# never collected; nation dim broadcasts.
# --------------------------------------------------------------------------

_Q11_VALUE = "l_extendedprice * l_quantity"
_Q11_ORACLE = f"""
SELECT l_partkey, {oracle_dsum(_Q11_VALUE)} AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING {oracle_dsum(_Q11_VALUE)} > (
  SELECT {oracle_dsum(_Q11_VALUE)} * 0.001
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
"""


@query("tpch_q11", _Q11_ORACLE)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    base = li.join(s, li["l_suppkey"] == s["s_suppkey"]).join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    )
    per_part = base.groupBy("l_partkey").agg(dsum(value, "value"))
    total = base.agg((dsum(value) * F.lit(0.001)).alias("__thr"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("__thr"))
        .drop("__thr")
    )


# --------------------------------------------------------------------------
# Corpus 5.sql (TPC-H Q12 shape). Repairs: l_shipmode/commitdate/
# receiptdate absent → group by l_linestatus, "late" = shipped >2 months
# after order date; CASE sums kept verbatim.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 2 MONTH
GROUP BY l_linestatus
"""


@query("tpch_q12", _Q12_ORACLE)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = (F.col("o_orderpriority") == "1-URGENT") | (
        F.col("o_orderpriority") == "2-HIGH"
    )
    lo = (F.col("o_orderpriority") != "1-URGENT") & (
        F.col("o_orderpriority") != "2-HIGH"
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 2 MONTHS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(lo, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Corpus 6.sql first half (TPC-H Q13 shape). Repairs: o_comment NOT LIKE
# '%special%requests%' → o_orderpriority <> '5-LOW' (fixture has no
# comment column); the second half of 6.sql references revenue0 (TPC-H
# Q15's view) which is a separate mangled fragment — covered by the
# Summing-view suite instead.
# Scale: LEFT JOIN keeps zero-order customers; two-level aggregation
# (per-customer then distribution) — both shuffles are on small keys.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@query("tpch_q13", _Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "5-LOW")
    c_orders = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Corpus 7.sql (TPC-H Q16 shape). Repairs: partsupp → part⋈lineitem
# (supplier-count per part from lineitem); Brand#45 → Brand#9;
# 'MEDIUM POLISHED%' → 'MEDIUM%'; s_comment filter → s_acctbal < 0.
# countUnique → exact count_distinct (SURVEY §2.5).
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#9'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("tpch_q16", _Q16_ORACLE)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nutdb_spark.operators.relational import not_in_subquery

    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = not_in_subquery(li, "l_suppkey", bad_supp)
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Corpus 8.sql (TPC-H Q21 shape). Repairs: receipt/commit late test →
# l_shipdate > o_orderdate + 1 month; SAUDI ARABIA → NATION_5.
# Scale: the EXISTS/NOT EXISTS pair lowers to semi+anti joins on
# l_orderkey — three scans of lineitem but all joins are key-partitioned;
# nation/supplier dims broadcast.
# --------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 1 MONTH
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 1 MONTH)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
GROUP BY s_name
"""


@query("tpch_q21", _Q21_ORACLE)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = load_table(spark, sf_dir, "lineitem").alias("l1")
    l2 = load_table(spark, sf_dir, "lineitem").alias("l2")
    l3 = load_table(spark, sf_dir, "lineitem").alias("l3")
    late = F.col("l1.l_shipdate") > o["o_orderdate"] + F.expr("INTERVAL 1 MONTH")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .filter(late)
        .join(s, F.col("l1.l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    base = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS correlates on o_orderdate too; keep it in the left before
    # the anti join (the anti condition may reference both sides).
    base = base.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")),
        "left_anti",
    )
    return base.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


# --------------------------------------------------------------------------
# Corpus 9.sql (TPC-H Q22 shape). Repairs: no c_phone → cntrycode is
# c_nationkey % 5 cast to string; the "has money" threshold uses the
# deterministic avg convention; NOT EXISTS restricted to big orders so
# the result is non-empty at fixture scale (every customer has orders).
# --------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT CAST(c_nationkey % 5 AS VARCHAR) AS cntrycode,
       COUNT(*) AS numcust,
       {oracle_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {oracle_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY cntrycode
"""


@query("tpch_q22", _Q22_ORACLE)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    thr = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "__thr"))
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    rich = (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__thr"))
        .drop("__thr")
    )
    rich = rich.join(
        big_orders, rich["c_custkey"] == big_orders["o_custkey"], "left_anti"
    )
    return rich.groupBy(
        F.col("c_nationkey").cast("long").__mod__(5).cast("string").alias("cntrycode")
    ).agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))


# --------------------------------------------------------------------------
# Classic TPC-H shapes beyond the corpus (Q3, Q5, Q6, Q10, Q14, Q18):
# the corpus mangles only 10 of the 22 TPC-H queries; these round out the
# join/agg surface as bench headliners. Same repair conventions (fixture
# columns, deterministic aggregates). LIMIT queries carry a unique
# tie-break key so the selected set is deterministic in both engines.
# --------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@query("tpch_q3", _Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name, {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@query("tpch_q5", _Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 star rollup. Repair: the classic local-supplier constraint
    (c_nationkey = s_nationkey) is dropped — the synthetic fixtures
    assign customer and supplier nations independently so it empties the
    result; revenue rolls up by the supplier's nation within ASIA."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"))
    )


_Q6_ORACLE = f"""
SELECT {oracle_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6", _Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue: pure scan+filter+agg — every predicate
    reaches the parquet scan as a PushedFilter (no casts on columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@query("tpch_q10", _Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q14_ORACLE = f"""
SELECT 100.0 * ({oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
             / ({oracle_dsum('l_extendedprice * (1 - l_discount)')}) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@query("tpch_q14", _Q14_ORACLE)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo share. Repair: p_type like 'PROMO%' → equality (fixture
    p_type is a single word). part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue"))
    )


_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice, SUM(l_quantity) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""


@query("tpch_q18", _Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume orders. l_quantity is integer-valued, so the
    double SUM is exact in both engines — no scaling convention needed.
    The IN-subquery lowers to a semi join against the grouped keys."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o_big = o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
    return (
        o_big.join(c, o_big["o_custkey"] == c["c_custkey"])
        .join(li, o_big["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape (correlated scalar subquery with aggregate): parts of
# one brand whose order quantity is below 20% of that part's average
# quantity. The classic decorrelation: the per-part correlated AVG
# becomes one groupBy + join. (No p_container in the fixture → brand
# filter only.) Reference anchor: correlated subqueries are
# grammatically reachable via parenthesized selects in expressions
# (/root/reference/src/parser/mod.rs expression grammar).
# --------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT {oracle_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk, {oracle_davg('l_quantity')} * 0.2 AS thr
      FROM lineitem GROUP BY l_partkey) t ON pk = l_partkey
WHERE p_brand = 'Brand#4' AND l_quantity < thr
"""


@query("tpch_q17", _Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG decorrelated into a pre-aggregate join;
    the aggregate input is pruned to the probed parts via a broadcast
    semi-join first (equivalent results — only probed parts survive the
    outer join anyway — but the per-part AVG state shrinks from every
    part to the brand's parts)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#4"
    )
    li_b = li.join(
        F.broadcast(p.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
        "left_semi",
    )
    thr = li_b.groupBy("l_partkey").agg(
        (davg("l_quantity") * 0.2).alias("__thr")
    )
    return (
        li_b.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__thr"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape (correlated MIN): rows matching their group's minimum.
# --------------------------------------------------------------------------


@query(
    "tpch_q2_mincost",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    """,
)
def tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN (the Q2 min-supplycost pattern on the available
    tables): decorrelated to a per-group aggregate broadcast-joined
    back — the equality probes an actual data value, so double
    comparison is exact."""
    p = load_table(spark, sf_dir, "part")
    m = p.groupBy(F.col("p_brand").alias("__b")).agg(
        F.min("p_retailprice").alias("__m")
    )
    return (
        p.join(
            F.broadcast(m),
            (F.col("p_brand") == F.col("__b"))
            & (F.col("p_retailprice") == F.col("__m")),
        )
        .select("p_partkey", "p_brand", "p_retailprice")
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape: revenue "view" (CTE) + agg-of-agg max selection.
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("tpch_q15", _Q15_ORACLE)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top-supplier: the revenue CTE computed once, its max taken
    as a 1-row broadcast, equality-probed back — agg-of-agg without
    recomputing the view (the plan reuses one exchange for both
    consumers). Double equality is safe: both sides compare values the
    same dsum convention produced."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
             "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__m"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-predicate join filter (OR of ANDs
# across both join sides). No p_container in the fixture → brand/size/
# quantity bands only.
# --------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19", _Q19_ORACLE)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive predicate: the OR-of-ANDs spans both sides of
    the join, so it can't be pushed into either scan wholly — but the
    per-side residuals (brand IN (...), quantity/size ranges) are
    implied and Catalyst derives them; the part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(band).agg(dsum(rev, "revenue"))


# --------------------------------------------------------------------------
# Q8 — national market share (corpus shape; classic TPC-H Q8).
# Repair: no partsupp in the fixtures, so the supplier joins directly via
# l_suppkey; p_type domain is the fixture's single-word set; nations are
# NATION_n with region n%5. Share of supplier-nation NATION_7 in the
# AMERICA customer region for ECONOMY parts, by order year.
# Scale notes: the dimension chain (part, supplier, nation x2, region)
# broadcasts; the only big shuffle is orders⋈lineitem; the year/nation
# rollup is a tiny partial+final agg. The share divides two
# deterministic floor-scaled sums in double — bit-identical cross-engine.
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       ({oracle_dsum("CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END")})
     / ({oracle_dsum('volume')}) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'ECONOMY') t
GROUP BY o_year
ORDER BY o_year
"""


@query("tpch_q8", _Q8_ORACLE)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r["r_regionkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    hit = F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        flat.groupBy("o_year")
        .agg(dsum(hit, "__num"), dsum(F.col("volume"), "__den"))
        .select(
            "o_year", (F.col("__num") / F.col("__den")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (classic TPC-H Q9).
# Repair: no partsupp (ps_supplycost) in the fixtures — the cost term is
# re-based on the part's retail price (amount = rev − 0.1·p_retailprice·qty),
# keeping Q9's two-term profit expression; the part filter uses the
# fixture vocabulary (%blue% — the corpus adjective 'green' is absent).
# Scale notes: part filter broadcasts and prunes lineitem early; one big
# shuffle (orders⋈lineitem); nation/year rollup is tiny.
# --------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT nation, o_year, {oracle_dsum('amount')} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.1 * p_retailprice * l_quantity AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%blue%') t
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("tpch_q9", _Q9_ORACLE)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (classic TPC-H Q20 shape).
# Repair: no partsupp (ps_availqty) — the excess-inventory test becomes a
# shipped-quantity threshold: suppliers who shipped more than 120 units of
# %red% parts during 1997, via the same nested IN-subquery + HAVING shape.
# Scale notes: the inner aggregate is a semi-join-reduced groupBy on
# l_suppkey; the outer IN lowers to a left-semi join; supplier side
# broadcasts.
# --------------------------------------------------------------------------

_Q20_ORACLE = f"""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING {oracle_dsum('l_quantity')} > 120)
ORDER BY s_suppkey
"""


@query("tpch_q20", _Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    heavy = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), "__q"))
        .filter(F.col("__q") > 120)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
