"""Per-operator correctness queries: joins J1-J10 (SURVEY.md §2.3).

Grammar anchor: /root/reference/src/parser/ast/query.rs:100-117, parse
at mod.rs:376-431. Spark has no right_semi/right_anti — those lower by
swapping sides (operators/relational.py). USING coalesces key columns.
Theta (non-equi) conditions follow corpus 8.sql:18.

Scale notes: dimension sides (region/nation/supplier) are broadcast
candidates under the session's 64 MB threshold — Catalyst picks
BroadcastHashJoin for them (asserted in tests/test_plans.py); the
fact-fact joins (orders⋈lineitem) shuffle on the join key with AQE
handling skew/coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.functions.exact import dsum, oracle_dsum
from nutdb_spark.operators.relational import right_anti, right_semi
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

# --- J1 INNER -------------------------------------------------------------


@query(
    "q_join_inner",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders, {oracle_dsum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


# --- J3 LEFT OUTER --------------------------------------------------------


@query(
    "q_join_left",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_pending
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT keeps customers with zero pending orders (COUNT of the null
    right side = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_pending"))
    )


# --- J4 RIGHT OUTER -------------------------------------------------------


@query(
    "q_join_right",
    """
    SELECT s_suppkey, s_name, n_name
    FROM (SELECT * FROM nation WHERE n_regionkey = 0) n
    RIGHT JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT keeps all suppliers; n_name is NULL outside region 0."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    s = load_table(spark, sf_dir, "supplier")
    return n.join(s, n["n_nationkey"] == s["s_nationkey"], "right").select(
        "s_suppkey", "s_name", "n_name"
    )


# --- J2 FULL OUTER --------------------------------------------------------


@query(
    "q_join_full",
    """
    SELECT cn.k AS ck, sn.k AS sk, cn.n_cust, sn.n_supp FROM
      (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer
       WHERE c_nationkey < 10 GROUP BY c_nationkey) cn
    FULL JOIN
      (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier
       WHERE s_nationkey >= 5 GROUP BY s_nationkey) sn
    ON cn.k = sn.k
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with nulls on both sides (disjoint key ranges)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 10)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 5)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn["k"] == sn["k"], "full").select(
        cn["k"].alias("ck"), sn["k"].alias("sk"), "n_cust", "n_supp"
    )


# --- J5 LEFT SEMI ---------------------------------------------------------


@query(
    "q_join_left_semi",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def q_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return p.join(li, p["p_partkey"] == li["l_partkey"], "left_semi")


# --- J6 RIGHT SEMI (side swap) --------------------------------------------


@query(
    "q_join_right_semi",
    """
    SELECT s_suppkey, s_acctbal FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.09)
    """,
)
def q_join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`lineitem RIGHT SEMI JOIN supplier` ≡ suppliers having a matching
    lineitem — lowered by swapping to left_semi (J6)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.09)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    return right_semi(li, s, li["l_suppkey"] == s["s_suppkey"])


# --- J7 LEFT ANTI ---------------------------------------------------------


@query(
    "q_join_left_anti",
    """
    SELECT p_partkey, p_brand FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 40)
    """,
)
def q_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered in bulk (l_partkey has no NULLs → anti-join
    is exact NOT IN here)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    return p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti")


# --- J8 RIGHT ANTI (side swap) --------------------------------------------


@query(
    "q_join_right_anti",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def q_join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return right_anti(o, c, o["o_custkey"] == c["c_custkey"])


# --- J10 USING (cols) — coalesced key (mod.rs:419-429) --------------------


@query(
    "q_join_using",
    """
    SELECT n_nationkey, n_name, s_name
    FROM nation JOIN (SELECT s_name, s_nationkey AS n_nationkey FROM supplier) s
    USING (n_nationkey)
    """,
)
def q_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_name", F.col("s_nationkey").alias("n_nationkey")
    )
    # list-of-names join == USING: one coalesced key column in the output
    return n.join(s, ["n_nationkey"]).select("n_nationkey", "n_name", "s_name")


# --- theta join (non-equi ON, corpus 8.sql:18) ----------------------------


@query(
    "q_join_theta",
    """
    SELECT s1.s_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM supplier s1 JOIN supplier s2
      ON s1.s_nationkey = s2.s_nationkey AND s1.s_suppkey <> s2.s_suppkey
    GROUP BY s1.s_nationkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + non-equi residual (`<>`) — Catalyst plans the equality
    as the hash key and the inequality as a post-join filter, so this
    stays a hash join, not a nested loop."""
    s1 = load_table(spark, sf_dir, "supplier").alias("s1")
    s2 = load_table(spark, sf_dir, "supplier").alias("s2")
    cond = (F.col("s1.s_nationkey") == F.col("s2.s_nationkey")) & (
        F.col("s1.s_suppkey") != F.col("s2.s_suppkey")
    )
    return (
        s1.join(s2, cond)
        .groupBy(F.col("s1.s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- broadcast dimension join (explicit hint) -----------------------------


@query(
    "q_join_broadcast",
    """
    SELECT r_name, n_name, COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicitly broadcast dimensions — the
    plan must contain zero shuffles before the final aggregate exchange
    (fact table never moves for the joins)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "q_join_salted",
    f"""
    SELECT e.user_id, e.event_type, c.c_mktsegment
    FROM (SELECT user_id, event_type FROM events WHERE event_type = 'click') e
    JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation salted join (operators/skew.py): the fact side's
    keys spread over 8 deterministic hash-salt partitions, the
    dimension replicated once per salt — row-identical to the plain
    equi-join, which is exactly what the oracle runs. The plan-level
    tool for the one-key-dominates case AQE's runtime splitting can't
    fit in an executor."""
    from nutdb_spark.operators.skew import salted_join

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "event_type")
    )
    c = load_table(spark, sf_dir, "customer")
    return salted_join(e, c, "user_id", "c_custkey", salt=8).select(
        "user_id", "event_type", "c_mktsegment"
    )


@query(
    "q_bucketed_join",
    """
    SELECT o.o_custkey AS cust, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_custkey < 300
    GROUP BY cust
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: orders and lineitem are
    materialized ONCE as 8-bucket tables hashed+sorted on the order
    key, then joined with zero Exchange (sort-merge over co-located
    buckets — plan-pinned in tests/test_bucketed_join.py). At 100 TB
    this converts the nightly orders⋈lineitem re-shuffle into a
    one-time write-side cost. Values are identical to the plain
    shuffle join, which is what the oracle replays."""
    from nutdb_spark.operators.bucketing import bucketed_join, ensure_bucketed

    o = ensure_bucketed(
        spark, load_table(spark, sf_dir, "orders"), sf_dir, "orders",
        "o_orderkey",
    )
    li = ensure_bucketed(
        spark, load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem",
        "l_orderkey",
    )
    j = bucketed_join(o, li, "o_orderkey", "l_orderkey")
    return (
        j.filter(F.col("o_custkey") < 300)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


_SKEW_AQE_ORACLE = """
WITH l AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS k,
         CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem),
agg AS (
  SELECT o.o_orderpriority AS pri,
         COUNT(*) AS n_rows,
         CAST(SUM(qty) AS BIGINT) AS sum_qty
  FROM l JOIN orders o ON o.o_orderkey = l.k
  GROUP BY 1)
SELECT 'plain' AS variant, pri, n_rows, sum_qty FROM agg
UNION ALL
SELECT 'salted' AS variant, pri, n_rows, sum_qty FROM agg
"""


@query("q_join_skew_aqe", _SKEW_AQE_ORACLE)
def q_join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately skewed join stress: ~30% of the fact table's rows
    remapped onto ONE hot key (orderkey 0), joined to orders two ways
    and unioned with a variant tag — (a) the plain sort-merge path,
    where AQE's skewJoin rewrite splits the hot partition at runtime
    (plan-pinned with lowered thresholds in tests/test_skew_aqe.py —
    the default 256 MB threshold rightly ignores test-SF data), and
    (b) the explicit salted path (operators/skew.py) for the
    one-key-exceeds-an-executor case AQE splitting can't save. The
    oracle computes the aggregate once and replays it under both tags:
    salted ≡ plain IS the correctness claim. floor() bridges Spark's
    truncating double→long cast vs DuckDB's rounding one."""
    from nutdb_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    def agg(j: DataFrame, tag: str) -> DataFrame:
        return (
            j.groupBy(F.col("o_orderpriority").alias("pri"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("qty").alias("sum_qty"),
            )
            .select(
                F.lit(tag).alias("variant"), "pri", "n_rows", "sum_qty"
            )
        )

    plain = li.hint("SHUFFLE_MERGE").join(o, li["k"] == o["o_orderkey"])
    salted = salted_join(li, o, "k", "o_orderkey", salt=8)
    return agg(plain, "plain").unionAll(agg(salted, "salted"))


@query(
    "q_join_bloom_filter",
    """
    SELECT o.o_orderpriority AS pri,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(l.l_extendedprice) AS BIGINT)) AS BIGINT)
             AS sum_price
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY pri
    """,
)
def q_join_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join: a selective dimension predicate
    (high-value orders) joined to the fact table through the shuffle
    path. At production sizes Spark's InjectRuntimeFilter rule builds
    a bloom_filter_agg over the FILTERED dim keys and plants
    might_contain(...) on the fact scan — fact rows that cannot join
    die before the shuffle, the row-level sibling of dynamic partition
    pruning (which needs a partitioned layout; this works on any
    layout). The default creation/application thresholds rightly
    ignore test-SF data, so injection is plan-pinned with lowered
    thresholds in tests/test_bloom_filter.py (the AQE-skew precedent);
    the VALUE is threshold-independent, which is what the oracle
    verifies. floor() bridges the double→long cast convention."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.floor("l_extendedprice").cast("long").alias("price")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.hint("SHUFFLE_MERGE")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").alias("sum_price"),
        )
    )
