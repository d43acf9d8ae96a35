"""Per-operator correctness queries: M2 query core (SURVEY.md §2.2).

One named suite entry per query-clause operator, each with a DuckDB
oracle. Queries are small but real: they run over the driver fixtures
and exercise exactly the lowering under test. Output order never
matters (the driver sorts rows before hashing), so ORDER BY appears
only where it defines WHICH rows survive (LIMIT family).

Reference anchors per entry are in the docstrings (SURVEY.md §2.2 rows
Q1-Q17; parser spans in /root/reference/src/parser/mod.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.functions.exact import davg, dsum, oracle_davg, oracle_dsum
from nutdb_spark.operators.relational import (
    distinct_on,
    exists_join,
    in_subquery,
    limit_offset,
    limit_with_ties,
    not_exists_join,
    not_in_subquery,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

# --- Q3 DISTINCT (mod.rs:292-297,349-360) ---------------------------------


@query(
    "q_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# --- Q4 DISTINCT ON (mod.rs:350-356) --------------------------------------


@query(
    "q_distinct_on",
    """
    SELECT c_nationkey, c_custkey, c_name FROM (
      SELECT c_nationkey, c_custkey, c_name,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer) t
    WHERE rn = 1
    """,
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (c_nationkey) keeping the first row by c_custkey —
    deterministic via the ordered window path."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_name"
    )
    return distinct_on(c, ["c_nationkey"], order_by=["c_custkey"])


# --- Q10 LIMIT / OFFSET / `LIMIT o,n` (mod.rs:503-543) --------------------


@query(
    "q_limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 20
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`LIMIT 20,10` (MySQL-style offset form, mod.rs:516-521) over a
    unique total order so the selected set is deterministic."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return limit_offset(o.orderBy("o_orderkey"), 10, offset=20)


# --- Q11 LIMIT n WITH TIES (mod.rs:536-541) -------------------------------


@query(
    "q_limit_with_ties",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             rank() OVER (ORDER BY l_quantity) AS rk
      FROM lineitem) t
    WHERE rk <= 10
    """,
)
def q_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return limit_with_ties(li, ["l_quantity"], 10)


# --- Q12 UNION ALL / UNION DISTINCT (mod.rs:243-276) ----------------------

_UNION_HALVES = """
SELECT n_name, n_regionkey FROM nation WHERE n_regionkey <= 2
{op}
SELECT n_name, n_regionkey FROM nation WHERE n_regionkey >= 2
"""


@query("q_union_all", _UNION_HALVES.format(op="UNION ALL"))
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap at n_regionkey=2 is kept twice (`ALL` keyword required by
    the dialect, mod.rs:258-264)."""
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    return n.filter(F.col("n_regionkey") <= 2).unionAll(
        n.filter(F.col("n_regionkey") >= 2)
    )


@query("q_union_distinct", _UNION_HALVES.format(op="UNION"))
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    return (
        n.filter(F.col("n_regionkey") <= 2)
        .union(n.filter(F.col("n_regionkey") >= 2))
        .distinct()
    )


# --- Q13 INTERSECT (mod.rs:257, binds tighter than UNION) -----------------


@query(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


# --- Q14 EXCEPT (mod.rs:265, distinct semantics) --------------------------


@query(
    "q_except",
    """
    SELECT p_size AS v FROM part
    EXCEPT
    SELECT n_nationkey AS v FROM nation
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(F.col("p_size").alias("v"))
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("v"))
    # DataFrame.subtract == EXCEPT DISTINCT, matching the dialect default
    return p.subtract(n)


# --- Q8 HAVING (mod.rs:462-474) -------------------------------------------


@query(
    "q_having",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {oracle_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
        .filter(F.col("n_orders") >= 15)
    )


# --- Q16 IN / NOT IN, list form (item.rs:154-155; corpus 5.sql:19) --------


@query(
    "q_in_list",
    """
    SELECT c_nationkey, COUNT(*) AS n
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    GROUP BY c_nationkey
    """,
)
def q_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_not_in_list",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def q_not_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_not_in_list_null",
    "SELECT o_orderkey FROM orders WHERE o_orderkey NOT IN (1, 2, NULL)",
)
def q_not_in_list_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL in the list is never TRUE (three-valued
    semantics, SURVEY §7.3 item 3) — both engines return zero rows.
    Lowered as an explicit OR-chain so the NULL literal participates."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    e = F.col("o_orderkey")
    in_expr = (e == F.lit(1)) | (e == F.lit(2)) | (e == F.lit(None))
    return o.filter(~in_expr)


# --- Q16 IN / NOT IN, subquery form (mod.rs:1404,1439-1440) ---------------


@query(
    "q_in_subquery",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    sub = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey")
    )
    return in_subquery(li, "l_orderkey", sub)


@query(
    "q_not_in_subquery",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -900)
    """,
)
def q_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    sub = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -900)
        .select("c_nationkey")
    )
    return not_in_subquery(s, "s_nationkey", sub).drop("s_nationkey")


@query(
    "q_not_in_subquery_null",
    """
    SELECT s_suppkey FROM supplier
    WHERE s_nationkey NOT IN (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END
      FROM customer)
    """,
)
def q_not_in_subquery_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-poisoned subquery → empty result in both engines."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sub = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("k")
    )
    return not_in_subquery(s, "s_nationkey", sub).drop("s_nationkey")


# --- Q17 EXISTS / NOT EXISTS (mod.rs:1413-1424,1450-1460) -----------------


@query(
    "q_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return exists_join(c, o, c["c_custkey"] == o["o_custkey"])


@query(
    "q_not_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return not_exists_join(c, o, c["c_custkey"] == o["o_custkey"])


# --- Q15 scalar subquery (mod.rs:1229-1235; corpus 9.sql:15-24) -----------


@query(
    "q_scalar_subquery",
    f"""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT {oracle_davg('c_acctbal')} FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → 1-row aggregate broadcast-joined
    (no collect; stays one lazy plan). Threshold uses the deterministic
    avg convention so both engines compare against the same double."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    thr = c.agg(davg("c_acctbal", "__thr"))
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__thr"))
        .drop("__thr")
    )


# --- Q1 WITH / CTEs (mod.rs:327-347; corpus 6.sql:1-11) -------------------


@query(
    "q_cte",
    """
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS big_cnt
      FROM orders WHERE o_totalprice > 250000
      GROUP BY o_custkey
    )
    SELECT c_mktsegment, CAST(SUM(big_cnt) AS BIGINT) AS total_big
    FROM customer JOIN big ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-recursive CTE = a named sub-plan; lowered as DataFrame
    composition (Catalyst sees straight through either way)."""
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("big_cnt"))
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(big, c["c_custkey"] == big["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.sum("big_cnt").alias("total_big"))
    )


# --- Q2 projection: wildcard + qualified wildcard (mod.rs:1511-1517) ------


@query("q_select_star", "SELECT * FROM region")
def q_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("*")


@query(
    "q_qualified_star",
    "SELECT n.*, r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
)
def q_qualified_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t.*` qualified wildcard (max one qualifier, item.rs:77-87)."""
    n = load_table(spark, sf_dir, "nation").alias("n")
    r = load_table(spark, sf_dir, "region").alias("r")
    return n.join(r, F.col("n.n_regionkey") == F.col("r.r_regionkey")).select(
        "n.*", "r_name"
    )
