"""Per-operator correctness queries: expression layer E1-E15 (SURVEY §2.4).

Precedence/semantics anchors: /root/reference/src/parser/mod.rs:1950-1966
(TokenPower ladder), ast/item.rs:126-162. Each query projects a family of
expression results over fixture rows so the DuckDB hash-compare checks
value semantics, not just types. All expressions are JVM-side built-ins —
whole-stage codegen covers every projection here (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

# --- E1 arithmetic + - * / % (item.rs:136-140) ----------------------------


@query(
    "q_expr_arith",
    """
    SELECT p_partkey,
           p_size + 7 AS add7, p_size - 7 AS sub7, p_size * 3 AS mul3,
           p_size / 4 AS div4, p_size % 5 AS mod5,
           -p_size AS neg, p_retailprice * 2 AS dbl
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/` on integers yields double in both engines; `%` keeps the
    dividend sign (E1)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        (sz + 7).alias("add7"),
        (sz - 7).alias("sub7"),
        (sz * 3).alias("mul3"),
        (sz / 4).alias("div4"),
        (sz % 5).alias("mod5"),
        (-sz).alias("neg"),
        (F.col("p_retailprice") * 2).alias("dbl"),
    )


# --- E2 comparisons = != <> < <= >= > (item.rs:141-146) -------------------


@query(
    "q_expr_compare",
    """
    SELECT p_partkey,
           p_size = 25 AS eq, p_size != 25 AS ne, p_size < 25 AS lt,
           p_size <= 25 AS le, p_size >= 25 AS ge, p_size > 25 AS gt
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        (sz == 25).alias("eq"),
        (sz != 25).alias("ne"),
        (sz < 25).alias("lt"),
        (sz <= 25).alias("le"),
        (sz >= 25).alias("ge"),
        (sz > 25).alias("gt"),
    )


# --- E3 AND OR XOR NOT (item.rs:147-149; corpus 14.sql) -------------------


@query(
    "q_expr_logic",
    """
    SELECT p_partkey,
           (p_size > 10 AND p_size < 40) AS both,
           (p_size < 10 OR p_size > 40) AS either,
           ((p_size > 10) <> (p_size < 40)) AS xor_v,
           NOT (p_size > 10) AS neg
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean XOR lowers to `!=` on booleans (SURVEY §2.4 E3)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    a, b = F.col("p_size") > 10, F.col("p_size") < 40
    return p.select(
        "p_partkey",
        (a & b).alias("both"),
        ((F.col("p_size") < 10) | (F.col("p_size") > 40)).alias("either"),
        (a != b).alias("xor_v"),
        (~a).alias("neg"),
    )


# --- E4 LIKE / ILIKE / NOT LIKE (item.rs:150-153; corpus 1.sql:19) --------


@query(
    "q_expr_like",
    """
    SELECT p_partkey, p_name,
           p_name LIKE '%red%' AS has_red,
           p_name ILIKE 'SMALL%' AS small_i,
           p_name NOT LIKE '%bolt' AS not_bolt
    FROM part WHERE p_partkey < 300
    """,
)
def q_expr_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    nm = F.col("p_name")
    return p.select(
        "p_partkey",
        "p_name",
        nm.like("%red%").alias("has_red"),
        nm.ilike("SMALL%").alias("small_i"),
        (~nm.like("%bolt")).alias("not_bolt"),
    )


# --- E6 BETWEEN / NOT BETWEEN (mod.rs:1445-1449; corpus 3.sql:25) ---------


@query(
    "q_expr_between",
    """
    SELECT p_partkey, p_size,
           p_size BETWEEN 15 AND 35 AS mid,
           p_size NOT BETWEEN 15 AND 35 AS outer_v
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        "p_size",
        sz.between(15, 35).alias("mid"),
        (~sz.between(15, 35)).alias("outer_v"),
    )


# --- E7 IS NULL / IS NOT NULL (mod.rs:1430-1438) --------------------------


@query(
    "q_expr_isnull",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS st,
           nullif(o_orderstatus, 'P') IS NULL AS is_p,
           nullif(o_orderstatus, 'P') IS NOT NULL AS not_p
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_expr_isnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        st.alias("st"),
        st.isNull().alias("is_p"),
        st.isNotNull().alias("not_p"),
    )


# --- E8 bitwise & | ^ ~ << >> (item.rs:157-161; corpus 10.sql:9) ----------


@query(
    "q_expr_bitwise",
    """
    SELECT p_partkey,
           p_size & 12 AS band, p_size | 12 AS bor, xor(p_size, 12) AS bxor,
           ~p_size AS bnot, p_size << 2 AS shl, p_size >> 1 AS shr
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB spells bitwise-xor `xor()` (its `^` is power); the dialect
    and Spark both use `^` (bitwiseXOR)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        sz.bitwiseAND(12).alias("band"),
        sz.bitwiseOR(12).alias("bor"),
        sz.bitwiseXOR(12).alias("bxor"),
        F.bitwise_not(sz).alias("bnot"),
        F.shiftleft(sz, 2).alias("shl"),
        F.shiftright(sz, 1).alias("shr"),
    )


# --- E9 index access expr[i], 1-based (item.rs:156; SURVEY §1.3 Array) ----


@query(
    "q_expr_index",
    """
    SELECT p_partkey,
           ([p_brand, p_type])[1] AS first_v,
           ([p_brand, p_type])[2] AS second_v,
           (string_split(p_name, ' '))[1] AS first_word
    FROM part WHERE p_partkey < 200
    """,
)
def q_expr_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-based array indexing (ClickHouse family) → element_at, which is
    also 1-based; DuckDB list indexing is 1-based too."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    arr = F.array(F.col("p_brand"), F.col("p_type"))
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.element_at(arr, 1).alias("first_v"),
        F.element_at(arr, 2).alias("second_v"),
        F.element_at(words, 1).alias("first_word"),
    )


# --- E11/E12/E13 IF, searched CASE, simple CASE (mod.rs:1570-1618) --------


@query(
    "q_expr_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'F' THEN 'final'
                              WHEN 'O' THEN 'open' END AS status_name,
           if(o_orderpriority = '1-URGENT', 1, 0) AS urgent
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE (ELSE default NULL, mod.rs:1608-1611), simple CASE
    with scrutinee, and IF sugar — all lower to F.when chains."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    tp = F.col("o_totalprice")
    bucket = (
        F.when(tp > 300000, "big").when(tp > 100000, "mid").otherwise("small")
    )
    st = F.col("o_orderstatus")
    status_name = F.when(st == "F", "final").when(st == "O", "open")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return o.select(
        "o_orderkey",
        bucket.alias("bucket"),
        status_name.alias("status_name"),
        urgent.alias("urgent"),
    )


# --- E1-on-strings: `+` concat idiom (corpus 10.sql:3) --------------------


@query(
    "q_expr_concat",
    """
    SELECT c_custkey, c_name || '/' || c_mktsegment AS tag
    FROM customer WHERE c_custkey < 100
    """,
)
def q_expr_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect allows `+` on strings (parses as Plus); lowers to
    F.concat (SURVEY §2.5 string-concat idiom)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("tag"),
    )


# --- INTERVAL literal arithmetic (item.rs:117-124; corpus 1.sql:15) -------


@query(
    "q_expr_interval",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus3m,
           o_orderdate - INTERVAL 10 DAY AS minus10d,
           o_orderdate + INTERVAL 2 HOUR AS plus2h
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_expr_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 MONTHS")).alias("plus3m"),
        (d - F.expr("INTERVAL 10 DAYS")).alias("minus10d"),
        (d + F.expr("INTERVAL 2 HOURS")).alias("plus2h"),
    )
