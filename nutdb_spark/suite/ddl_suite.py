"""DDL + write-path suite (S2-S15): engine-managed tables round-trip
through dialect SQL — CREATE (types/defaults/enums/serials/constraints)
→ INSERT → query → hash-check.

The managed catalog lives outside DuckDB's view of the world, so the
oracles re-derive the expected result from VALUES literals (INSERT
payload is known) or from the fixture tables (INSERT…SELECT case).
Entries drop-and-recreate their objects so they are idempotent across
runs. NOTE for the laziness test: these callables execute writes by
design (INSERT is an action); they are excluded there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.suite.registry import query


def _engine(spark: SparkSession, sf_dir: str):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir)


@query(
    "q_ddl_roundtrip",
    """
    SELECT tag, COUNT(*) AS n, CAST(SUM(score) AS BIGINT) AS total
    FROM (VALUES ('a', 5), ('b', 7), ('a', 3), ('b', 0)) t(tag, score)
    GROUP BY tag
    """,
)
def q_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE with serial id, enum, default, CHECK; INSERT…VALUES
    (arity + constraint validation on the write path); aggregate back.
    Reference shapes: tests/sql/11.sql (DDL), 13.sql (multi-row insert).
    """
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ddl_rt")
    eng.sql(
        """
        CREATE TABLE ddl_rt (
          id Serial64,
          tag Enum('a' = 1, 'b' = 2),
          score Int64 DEFAULT 0,
          CONSTRAINT nonneg CHECK score >= 0
        ) ORDER BY (tag)
        """
    )
    eng.sql("INSERT INTO ddl_rt (tag, score) VALUES ('a', 5), ('b', 7), ('a', 3)")
    eng.sql("INSERT INTO ddl_rt (tag) VALUES ('b')")  # DEFAULT fills score=0
    return eng.sql(
        "SELECT tag, count(*) AS n, sum(score) AS total FROM ddl_rt GROUP BY tag"
    )


@query(
    "q_ddl_view_summing",
    """
    SELECT k, CAST(SUM(v) AS BIGINT) AS v FROM (
      SELECT * FROM (VALUES (1, 10), (2, 20), (1, 5)) a(k, v)
      UNION ALL
      SELECT * FROM (VALUES (2, 2), (3, 1)) b(k, v)
    ) u GROUP BY k
    """,
)
def q_ddl_view_summing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW … UPDATE BY Summing over a UNION ALL query (corpus
    12.sql shape): the view materializes with SummingMergeTree
    semantics — numeric non-key columns summed per ORDER BY key."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS sum_v")
    eng.sql("DROP TABLE IF EXISTS sum_a")
    eng.sql("DROP TABLE IF EXISTS sum_b")
    eng.sql("CREATE TABLE sum_a (k Int32, v Int64)")
    eng.sql("CREATE TABLE sum_b (k Int32, v Int64)")
    eng.sql("INSERT INTO sum_a (k, v) VALUES (1, 10), (2, 20), (1, 5)")
    eng.sql("INSERT INTO sum_b (k, v) VALUES (2, 2), (3, 1)")
    eng.sql(
        """
        CREATE VIEW sum_v UPDATE BY Summing ORDER BY (k) AS
        SELECT k, v FROM sum_a
        UNION ALL
        SELECT k, v FROM sum_b
        """
    )
    return eng.sql("SELECT k, v FROM sum_v")


@query(
    "q_ddl_view_summing_incremental",
    """
    SELECT k, CAST(SUM(v) AS BIGINT) AS v FROM (
      VALUES (1, 10), (2, 20), (1, 5), (2, 2), (3, 1), (3, 100), (4, 7)
    ) u(k, v) GROUP BY k
    """,
)
def q_ddl_view_summing_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW … UPDATE BY Summing maintained INCREMENTALLY: the
    view is created over EMPTY base tables, then three separate inserts
    flow through the defining query and merge into the bucketed state
    (streaming/summing.py — per insert only the touched buckets are
    rewritten, never a full recompute). The oracle is the one-shot
    aggregate over all inserted rows, so incremental state must
    hash-match the full-refresh semantics exactly."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS inc_v")
    eng.sql("DROP TABLE IF EXISTS inc_a")
    eng.sql("DROP TABLE IF EXISTS inc_b")
    eng.sql("CREATE TABLE inc_a (k Int32, v Int64)")
    eng.sql("CREATE TABLE inc_b (k Int32, v Int64)")
    eng.sql(
        """
        CREATE VIEW inc_v UPDATE BY Summing ORDER BY (k) AS
        SELECT k, v FROM inc_a
        UNION ALL
        SELECT k, v FROM inc_b
        """
    )
    eng.sql("INSERT INTO inc_a (k, v) VALUES (1, 10), (2, 20), (1, 5)")
    eng.sql("INSERT INTO inc_b (k, v) VALUES (2, 2), (3, 1)")
    eng.sql("INSERT INTO inc_a (k, v) VALUES (3, 100), (4, 7)")
    return eng.sql("SELECT k, v FROM inc_v")


@query(
    "q_ddl_view_replacing",
    """
    SELECT k, ver, v FROM (
      VALUES (1, 1, 10), (1, 3, 30), (1, 2, 20),
             (2, 7, 70), (2, 5, 50), (3, 1, 99)
    ) t(k, ver, v)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) = 1
    """,
)
def q_ddl_view_replacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW … UPDATE BY Replacing (the reference grammar accepts
    any strategy identifier, src/parser/mod.rs:834-844):
    ReplacingMergeTree(ver) semantics — per ORDER BY key keep the row
    with the greatest PRIMARY KEY version. Maintained across inserts
    that arrive BEFORE and AFTER the view exists."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS rep_v")
    eng.sql("DROP TABLE IF EXISTS rep_t")
    eng.sql("CREATE TABLE rep_t (k Int32, ver Int64, v Int64)")
    eng.sql(
        "INSERT INTO rep_t (k, ver, v) VALUES (1, 1, 10), (1, 3, 30), (2, 7, 70)"
    )
    eng.sql(
        """
        CREATE VIEW rep_v UPDATE BY Replacing PRIMARY KEY (ver)
        ORDER BY (k) AS SELECT k, ver, v FROM rep_t
        """
    )
    eng.sql(
        "INSERT INTO rep_t (k, ver, v) VALUES (1, 2, 20), (2, 5, 50), (3, 1, 99)"
    )
    return eng.sql("SELECT k, ver, v FROM rep_v")


@query(
    "q_ddl_insert_select",
    """
    SELECT flag, COUNT(*) AS n, CAST(SUM(qty) AS BIGINT) AS total FROM (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_orderkey < 1000) t
    GROUP BY flag
    """,
)
def q_ddl_insert_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT…SELECT (S3): populate a managed table from a fixture
    query, then aggregate the managed copy."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ins_sel")
    eng.sql("CREATE TABLE ins_sel (flag String, qty Int64)")
    eng.sql(
        """
        INSERT INTO ins_sel (flag, qty)
        SELECT l_returnflag, l_quantity FROM lineitem WHERE l_orderkey < 1000
        """
    )
    return eng.sql(
        "SELECT flag, count(*) AS n, sum(qty) AS total FROM ins_sel GROUP BY flag"
    )


@query(
    "q_ddl_alter",
    """
    SELECT name, score * 2 AS boosted FROM
      (VALUES ('x', 5), ('y', 7)) t(name, score)
    """,
)
def q_ddl_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMN with a computed backfill via the DEFAULT
    expression, then RENAME (S8, S10)."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS alt_t")
    eng.sql("CREATE TABLE alt_t (name String, score Int32)")
    eng.sql("INSERT INTO alt_t (name, score) VALUES ('x', 5), ('y', 7)")
    eng.sql("ALTER TABLE alt_t ADD COLUMN b2 Int32 DEFAULT 0 AFTER name")
    eng.sql("ALTER TABLE alt_t RENAME COLUMN b2 boosted")
    eng.sql("DROP TABLE IF EXISTS alt_t2")
    # rebuild boosted = score*2 via INSERT…SELECT into a fresh table
    eng.sql("CREATE TABLE alt_t2 (name String, boosted Int32)")
    eng.sql("INSERT INTO alt_t2 (name, boosted) SELECT name, score * 2 FROM alt_t")
    return eng.sql("SELECT name, boosted FROM alt_t2")


@query(
    "q_ddl_complex_types",
    """
    SELECT id, a1, ms FROM (VALUES
      (CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(5 AS BIGINT)),
      (CAST(2 AS BIGINT), CAST(30 AS BIGINT), CAST(7 AS BIGINT))
    ) v(id, a1, ms)
    """,
)
def q_ddl_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-typed DDL end to end: Array / Map / Tuple columns
    (reference type grammar §1.3) created, inserted as literals
    (`[..]`, `{k:v}`, `(..)` through the dialect frontend), persisted
    to parquet, and read back through 1-based index access."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS cplx")
    eng.sql(
        """
        CREATE TABLE cplx (
          id Int64,
          arr Array(Int64),
          m Map(String, Int64),
          t Tuple(String, Int64)
        )
        """
    )
    eng.sql(
        "INSERT INTO cplx (id, arr, m, t) VALUES "
        "(1, [10, 20], {'s': 5}, ('x', 1)), "
        "(2, [30], {'s': 7}, ('y', 2))"
    )
    return eng.sql("SELECT id, arr[1] AS a1, m['s'] AS ms FROM cplx")


@query(
    "q_ddl_optimize",
    """
    SELECT k, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
    FROM (SELECT CAST(l_orderkey % 5 AS BIGINT) AS k,
                 CAST(l_linenumber AS BIGINT) AS v
          FROM lineitem WHERE l_orderkey < 2000) t
    GROUP BY k
    """,
)
def q_ddl_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE + TRUNCATE (S13/S14) end to end: many small inserts
    fragment the table, OPTIMIZE compacts to ~128 MB-target files
    (pytest asserts the file count drops), and the data must be
    byte-identical before and after — which is what the oracle checks.
    TRUNCATE is exercised on a scratch copy first."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS opt_t")
    eng.sql("CREATE TABLE opt_t (k Int64, v Int64)")
    # fragment: 3 separate inserts → ≥3 parquet files
    for lo, hi in ((0, 700), (700, 1400), (1400, 2000)):
        eng.sql(
            f"INSERT INTO opt_t (k, v) "
            f"SELECT l_orderkey % 5, l_linenumber FROM lineitem "
            f"WHERE l_orderkey >= {lo} AND l_orderkey < {hi}"
        )
    eng.sql("OPTIMIZE TABLE opt_t")
    # TRUNCATE on a scratch table proves S13 without touching opt_t
    eng.sql("DROP TABLE IF EXISTS trunc_t")
    eng.sql("CREATE TABLE trunc_t (x Int64)")
    eng.sql("INSERT INTO trunc_t (x) VALUES (1), (2)")
    eng.sql("TRUNCATE TABLE trunc_t")
    return eng.sql(
        "SELECT k, count(*) AS n, sum(v) AS total FROM opt_t GROUP BY k"
    )


@query(
    "q_ddl_mutate",
    """
    SELECT CAST(k AS BIGINT) AS k, tag, CAST(v AS BIGINT) AS v FROM (
      SELECT k, tag,
             CASE WHEN tag = 'a' AND v < 50 THEN v * 10 ELSE v END AS v
      FROM (VALUES (1, 'a', 5), (2, 'b', 7), (3, 'a', 80),
                   (4, 'c', 9), (5, 'b', 50)) t(k, tag, v)
    ) u
    WHERE v < 80
    ORDER BY k
    """,
)
def q_ddl_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] ClickHouse-style mutations: `ALTER TABLE t UPDATE c = expr
    WHERE cond` and `ALTER TABLE t DELETE WHERE cond`. Lowered as a
    distributed read → conditional projection / anti-filter → atomic
    rewrite (tmp + dir swap), preserving the declared partition layout
    and ORDER BY clustering; WHERE is mandatory (ClickHouse rule) so a
    forgotten predicate can't wipe a table, UPDATE re-validates CHECK /
    enum / NOT-NULL invariants, and both mutations trigger dependent
    incremental-view repair. The oracle replays the UPDATE as a CASE
    and the DELETE as a filter over the same VALUES — order-sensitive
    (the DELETE sees post-UPDATE values)."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS mut_t")
    eng.sql("CREATE TABLE mut_t (k Int64, tag String, v Int64)")
    eng.sql(
        "INSERT INTO mut_t (k, tag, v) VALUES "
        "(1, 'a', 5), (2, 'b', 7), (3, 'a', 80), (4, 'c', 9), (5, 'b', 50)"
    )
    eng.sql("ALTER TABLE mut_t UPDATE v = v * 10 WHERE tag = 'a' AND v < 50")
    eng.sql("ALTER TABLE mut_t DELETE WHERE v >= 80")
    return eng.sql("SELECT k, tag, v FROM mut_t ORDER BY k")


@query(
    "q_ddl_ctas",
    """
    SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s
    FROM nation WHERE n_nationkey < 20
    GROUP BY n_regionkey
    """,
)
def q_ddl_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CREATE TABLE ... AS SELECT (CTAS, with ENGINE/ORDER BY
    accepted ClickHouse-style), CREATE OR REPLACE TABLE, and the
    statement-level RENAME TABLE a TO b. The CTAS write is the query's
    own distributed plan (schema derived from the query output) and
    the replace leg proves drop-and-recreate atomicity at the catalog
    level."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ctas_t")
    eng.sql("DROP TABLE IF EXISTS ctas_final")
    # first version: too many rows — OR REPLACE must supersede it
    eng.sql("CREATE TABLE ctas_t AS SELECT n_nationkey, n_regionkey FROM nation")
    eng.sql(
        """
        CREATE OR REPLACE TABLE ctas_t ENGINE = MergeTree
        ORDER BY n_nationkey
        AS SELECT n_nationkey, n_regionkey FROM nation
           WHERE n_nationkey < 20
        """
    )
    eng.sql("RENAME TABLE ctas_t TO ctas_final")
    return eng.sql(
        """
        SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS s
        FROM ctas_final GROUP BY n_regionkey
        """
    )


@query(
    "q_ddl_view_aggregating",
    """
    SELECT tag, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
           CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
    FROM (VALUES (1, 10), (1, 5), (2, 7), (1, 30), (2, 2), (3, 40))
         t(tag, v)
    GROUP BY tag
    """,
)
def q_ddl_view_aggregating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CREATE VIEW ... UPDATE BY Aggregating — ClickHouse
    AggregatingMergeTree for the re-aggregatable functions: the view
    query carries its own GROUP BY with sum/count/min/max outputs,
    and each INSERT merges the delta's partial aggregates into the
    bucketed state under per-column operators (counts ADD, min/max
    keep-extreme) — O(touched buckets) per insert, never a recompute.
    The second INSERT must move every aggregate of the touched keys
    (count +, sum +, min down, max up) for the oracle to match."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS agg_v")
    eng.sql("DROP TABLE IF EXISTS agg_t")
    eng.sql("CREATE TABLE agg_t (tag Int32, v Int64) ORDER BY (tag)")
    eng.sql("INSERT INTO agg_t (tag, v) VALUES (1, 10), (1, 5), (2, 7)")
    eng.sql(
        """
        CREATE VIEW agg_v UPDATE BY Aggregating ORDER BY (tag) AS
        SELECT tag, count(*) AS n, sum(v) AS s, min(v) AS lo,
               max(v) AS hi
        FROM agg_t GROUP BY tag
        """
    )
    eng.sql("INSERT INTO agg_t (tag, v) VALUES (1, 30), (2, 2), (3, 40)")
    return eng.sql("SELECT tag, n, s, lo, hi FROM agg_v")


@query(
    "q_ddl_optimize_dedup",
    """
    WITH src AS (
      SELECT CAST(l_orderkey % 7 AS BIGINT) AS k,
             CAST(l_linenumber % 3 AS BIGINT) AS tag,
             CAST(l_suppkey AS BIGINT) AS v
      FROM lineitem WHERE l_orderkey < 1500),
    uni AS (SELECT DISTINCT k, tag, v FROM src),
    keyed AS (
      SELECT k, tag, v FROM (
        SELECT k, tag, v,
               row_number() OVER (PARTITION BY k, tag
                                  ORDER BY v ASC NULLS FIRST) AS rn
        FROM uni) t WHERE rn = 1)
    SELECT k, tag, CAST(sum(v) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM keyed GROUP BY k, tag
    """,
)
def q_ddl_optimize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] OPTIMIZE ... DEDUPLICATE and MODIFY COLUMN end to end:
    the table is loaded TWICE (exact duplicates), full-row
    DEDUPLICATE collapses them during compaction, then DEDUPLICATE BY
    (k, tag) keeps exactly one row per key — deterministically (min
    over the remaining columns, unlike CH's arbitrary pick, so the
    rewrite is oracle-able). A MODIFY COLUMN retype (Int32→Int64)
    runs before the final read to prove the cast-rewrite path. The
    oracle replays both dedups with DISTINCT + a row_number pick."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS opt_dd")
    eng.sql("CREATE TABLE opt_dd (k Int64, tag Int64, v Int32)")
    for _ in range(2):  # exact duplicates across two loads
        eng.sql(
            "INSERT INTO opt_dd (k, tag, v) "
            "SELECT l_orderkey % 7, l_linenumber % 3, l_suppkey "
            "FROM lineitem WHERE l_orderkey < 1500"
        )
    eng.sql("OPTIMIZE TABLE opt_dd DEDUPLICATE")
    eng.sql("ALTER TABLE opt_dd MODIFY COLUMN v Int64")
    eng.sql("OPTIMIZE TABLE opt_dd FINAL DEDUPLICATE BY k, tag")
    return eng.sql(
        "SELECT k, tag, sum(v) AS total, count(*) AS n "
        "FROM opt_dd GROUP BY k, tag"
    )


@query(
    "q_ddl_exchange",
    """
    SELECT 'a' AS t, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_suppkey) AS BIGINT) AS s
    FROM lineitem WHERE l_orderkey >= 500 AND l_orderkey < 900
    UNION ALL
    SELECT 'b', CAST(count(*) AS BIGINT),
           CAST(sum(l_suppkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey < 500
    ORDER BY t
    """,
)
def q_ddl_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] EXCHANGE TABLES end to end: two tables loaded from
    disjoint lineitem slices, swapped, then aggregated under their
    (exchanged) names — table xa must now report the slice originally
    loaded into xb and vice versa, which is exactly what the oracle
    states by querying the slices crosswise."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS xa")
    eng.sql("DROP TABLE IF EXISTS xb")
    eng.sql("CREATE TABLE xa (k Int64, v Int64)")
    eng.sql("CREATE TABLE xb (k Int64, v Int64)")
    eng.sql(
        "INSERT INTO xa (k, v) SELECT l_orderkey, l_suppkey "
        "FROM lineitem WHERE l_orderkey < 500"
    )
    eng.sql(
        "INSERT INTO xb (k, v) SELECT l_orderkey, l_suppkey "
        "FROM lineitem WHERE l_orderkey >= 500 AND l_orderkey < 900"
    )
    eng.sql("EXCHANGE TABLES xa AND xb")
    return eng.sql(
        "SELECT 'a' AS t, count(*) AS n, sum(v) AS s FROM xa "
        "UNION ALL "
        "SELECT 'b' AS t, count(*) AS n, sum(v) AS s FROM xb "
        "ORDER BY t"
    )


@query(
    "q_ddl_view_plain",
    """
    WITH v AS (
      SELECT l_orderkey AS k, l_returnflag AS rf,
             l_quantity * (1 - l_discount) AS net
      FROM lineitem WHERE l_quantity > 30)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(floor(net * 100)) AS BIGINT) / 100.0 AS s
    FROM v WHERE k % 2 = 0 GROUP BY rf ORDER BY rf
    """,
)
def q_ddl_view_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] PLAIN (non-materialized) views: CREATE VIEW without the
    reference grammar's UPDATE BY stores only the query; every read
    lowers it fresh, so the view composes with the outer plan —
    the outer WHERE pushes through the view into the parquet scan
    (plan-pinned in tests/test_view_maintenance.py) and nothing is
    materialized or maintained. The oracle inlines the view as a
    CTE."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS vp")
    eng.sql(
        "CREATE VIEW vp AS SELECT l_orderkey AS k, "
        "l_returnflag AS rf, l_quantity * (1 - l_discount) AS net "
        "FROM lineitem WHERE l_quantity > 30"
    )
    return eng.sql(
        "SELECT rf, count() AS n, "
        "sum(floor(net * 100)) / 100.0 AS s "
        "FROM vp WHERE k % 2 = 0 GROUP BY rf ORDER BY rf"
    )


@query(
    "q_ddl_projection_rewrite",
    """
    WITH base AS (
      SELECT * FROM (VALUES
        ('e', 'a', 1, 10), ('e', 'b', 2, 20), ('w', 'a', 3, 30),
        ('w', 'a', 4, 40), ('e', 'a', 5, 50), ('n', 'c', 6, 60)
      ) t(region, item, qty, amount))
    SELECT region, CAST(SUM(qty) AS BIGINT) AS q,
           CAST(SUM(amount) AS BIGINT) AS a, 'keys' AS variant
    FROM base GROUP BY region
    UNION ALL
    SELECT item AS region, CAST(SUM(qty) AS BIGINT) AS q,
           CAST(SUM(amount) AS BIGINT) AS a, 'rollup' AS variant
    FROM base WHERE item <> 'b' GROUP BY item
    UNION ALL
    SELECT region, CAST(SUM(qty) AS BIGINT) AS q,
           CAST(SUM(amount) AS BIGINT) AS a, 'off' AS variant
    FROM base GROUP BY region
    """,
)
def q_ddl_projection_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Summing-view AUTO-REWRITE — ClickHouse's projection
    answer path: `SELECT keys, sum(v) FROM base GROUP BY keys` is
    rewritten onto a Summing view over base when the view's merge
    keys cover the query keys (engine._try_projection_rewrite). Three
    variants union-tagged: full-key grouping, a coarser rollup with a
    key-only WHERE (both REWRITTEN — re-summing merged rows rolls up
    exactly; the plan pin lives in tests/test_projection_rewrite.py),
    and the SETTINGS optimize_use_projections = 0 off-switch reading
    the base table. The oracle recomputes all three from the insert
    payload — rewritten ≡ direct IS the correctness claim, including
    freshness across the second INSERT (the view is maintained on
    every write, the CH contract)."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS proj_sum")
    eng.sql("DROP TABLE IF EXISTS proj_sales")
    eng.sql(
        "CREATE TABLE proj_sales (region String, item String, "
        "qty Int64, amount Int64)"
    )
    eng.sql(
        "INSERT INTO proj_sales VALUES ('e','a',1,10), ('e','b',2,20), "
        "('w','a',3,30), ('w','a',4,40)"
    )
    eng.sql(
        "CREATE VIEW proj_sum UPDATE BY Summing ORDER BY (region, item) "
        "AS SELECT region, item, qty, amount FROM proj_sales"
    )
    # freshness: the rewrite must see post-view inserts too
    eng.sql("INSERT INTO proj_sales VALUES ('e','a',5,50), ('n','c',6,60)")
    keys = eng.sql(
        "SELECT region, sum(qty) AS q, sum(amount) AS a "
        "FROM proj_sales GROUP BY region"
    ).withColumn("variant", F.lit("keys"))
    rollup = eng.sql(
        "SELECT item AS region, sum(qty) AS q, sum(amount) AS a "
        "FROM proj_sales WHERE item != 'b' GROUP BY item"
    ).withColumn("variant", F.lit("rollup"))
    off = eng.sql(
        "SELECT region, sum(qty) AS q, sum(amount) AS a "
        "FROM proj_sales GROUP BY region "
        "SETTINGS optimize_use_projections = 0"
    ).withColumn("variant", F.lit("off"))
    return keys.unionAll(rollup).unionAll(off)


@query(
    "q_ddl_ops",
    """
    SELECT phase, n, total FROM (VALUES
      ('attached', 3, CAST(60 AS BIGINT)),
      ('restored', 3, CAST(60 AS BIGINT))
    ) t(phase, n, total)
    """,
)
def q_ddl_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Operational DDL roundtrip: DETACH hides the table from
    resolution (data untouched), ATTACH restores it; BACKUP copies
    meta + parquet out of the catalog, RESTORE recreates the table
    from the copy (refusing to clobber). The entry proves both
    roundtrips are LOSSLESS: the aggregate after detach→attach and
    after backup→drop→restore (taken AFTER a post-backup insert was
    dropped with the table) equals the known insert payload."""
    import tempfile

    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ops_t")
    eng.sql("CREATE TABLE ops_t (k Int32, v Int64)")
    eng.sql("INSERT INTO ops_t VALUES (1, 10), (2, 20), (3, 30)")
    eng.sql("DETACH TABLE ops_t")
    eng.sql("ATTACH TABLE ops_t")
    a = eng.sql(
        "SELECT count() AS n, sum(v) AS total FROM ops_t"
    ).select(F.lit("attached").alias("phase"), "n", "total")
    bdir = tempfile.mkdtemp(prefix="q_ddl_ops_") + "/bk"
    eng.sql(f"BACKUP TABLE ops_t TO '{bdir}'")
    eng.sql("INSERT INTO ops_t VALUES (9, 900)")  # must NOT survive
    eng.sql("DROP TABLE ops_t")
    eng.sql(f"RESTORE TABLE ops_t FROM '{bdir}'")
    b = eng.sql(
        "SELECT count() AS n, sum(v) AS total FROM ops_t"
    ).select(F.lit("restored").alias("phase"), "n", "total")
    return a.unionAll(b)


@query(
    "sql_table_fn_merge",
    """
    SELECT src, k, CAST(SUM(v) AS BIGINT) AS total FROM (
      SELECT 'mrg_a' AS src, k, v
      FROM (VALUES (1, 10), (2, 20)) a(k, v)
      UNION ALL
      SELECT 'mrg_b' AS src, k, v
      FROM (VALUES (1, 5), (3, 30)) b(k, v)
    ) u GROUP BY src, k
    """,
)
def sql_table_fn_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] merge('regex') table function — CH's multi-table union
    source: every catalog table matching the regex (partial match),
    unioned BY NAME with the `_table` virtual column naming the
    source (CH's virtual column). The non-matching decoy table proves
    the regex actually filters. Scale shape: a union of scans — each
    source keeps its own pushdowns; no shuffle added."""
    eng = _engine(spark, sf_dir)
    for t in ("mrg_a", "mrg_b", "decoy"):
        eng.sql(f"DROP TABLE IF EXISTS {t}")
        eng.sql(f"CREATE TABLE {t} (k Int32, v Int64)")
    eng.sql("INSERT INTO mrg_a VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO mrg_b VALUES (1, 5), (3, 30)")
    eng.sql("INSERT INTO decoy VALUES (9, 999)")
    return eng.sql(
        """
        select _table as src, k, sum(v) as total
        from merge('^mrg_') group by _table, k
        """
    )


@query(
    "q_ddl_merge_into",
    """
    WITH tgt AS (
      SELECT * FROM (VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30),
                            (5, 'b', 50)) t(id, tag, v)),
    src AS (
      SELECT * FROM (VALUES (2, 'b', 99), (3, 'x', 7), (4, 'c', 40),
                            (6, 'skip', 6)) s(id, tag, v)),
    upd AS (
      SELECT t.id,
             CASE WHEN s.id IS NOT NULL AND s.tag != 'x'
                  THEN s.tag ELSE t.tag END AS tag,
             CASE WHEN s.id IS NOT NULL AND s.tag != 'x'
                  THEN s.v + t.v ELSE t.v END AS v,
             CASE WHEN s.id IS NOT NULL AND s.tag = 'x'
                  THEN 1 ELSE 0 END AS del
      FROM tgt t LEFT JOIN src s USING (id)),
    kept AS (SELECT id, tag, v FROM upd WHERE del = 0),
    ins AS (
      SELECT s.id, s.tag, s.v FROM src s LEFT JOIN tgt t USING (id)
      WHERE t.id IS NULL AND s.tag != 'skip')
    SELECT CAST(id AS BIGINT) AS id, tag, CAST(v AS BIGINT) AS v FROM (
      SELECT * FROM kept UNION ALL SELECT * FROM ins) u
    ORDER BY id
    """,
)
def q_ddl_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] ANSI MERGE INTO — the warehouse upsert: one statement
    applies ordered WHEN MATCHED (first-match-wins: a DELETE guard
    clause ahead of the UPDATE) and conditional WHEN NOT MATCHED
    INSERT against a source table. Executed as one decision join +
    atomic rewrite + the standard insert path (catalog.merge);
    multiple source matches per target row raise (ANSI cardinality
    rule, pytest-pinned with the clause-order / default / serial /
    CHECK / view-repair semantics in tests/test_merge_into.py). The
    oracle replays the matched CASEs and the anti-join insert."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS merge_t")
    eng.sql("DROP TABLE IF EXISTS merge_s")
    eng.sql("CREATE TABLE merge_t (id Int64, tag String, v Int64)")
    eng.sql(
        "INSERT INTO merge_t (id, tag, v) VALUES "
        "(1, 'a', 10), (2, 'b', 20), (3, 'a', 30), (5, 'b', 50)"
    )
    eng.sql("CREATE TABLE merge_s (id Int64, tag String, v Int64)")
    eng.sql(
        "INSERT INTO merge_s (id, tag, v) VALUES "
        "(2, 'b', 99), (3, 'x', 7), (4, 'c', 40), (6, 'skip', 6)"
    )
    eng.sql(
        "MERGE INTO merge_t AS t USING merge_s AS s ON t.id = s.id "
        "WHEN MATCHED AND s.tag = 'x' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s.v + t.v, tag = s.tag "
        "WHEN NOT MATCHED AND s.tag != 'skip' THEN "
        "INSERT (id, tag, v) VALUES (s.id, s.tag, s.v)"
    )
    return eng.sql("SELECT id, tag, v FROM merge_t ORDER BY id")


@query(
    "q_ddl_merge_sync",
    """
    WITH tgt AS (
      SELECT * FROM (VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30),
                            (7, 'b', 70)) t(id, tag, v)),
    src AS (
      SELECT * FROM (VALUES (1, 'a', 11), (4, 'd', 40)) s(id, tag, v)),
    upd AS (
      SELECT t.id,
             CASE WHEN s.id IS NULL AND NOT (t.tag = 'b')
                  THEN 'stale' ELSE t.tag END AS tag,
             CASE WHEN s.id IS NOT NULL THEN s.v ELSE t.v END AS v,
             CASE WHEN s.id IS NULL AND t.tag = 'b'
                  THEN 1 ELSE 0 END AS del
      FROM tgt t LEFT JOIN src s USING (id)),
    kept AS (SELECT id, tag, v FROM upd WHERE del = 0),
    ins AS (
      SELECT s.id, s.tag, s.v FROM src s LEFT JOIN tgt t USING (id)
      WHERE t.id IS NULL)
    SELECT CAST(id AS BIGINT) AS id, tag, CAST(v AS BIGINT) AS v FROM (
      SELECT * FROM kept UNION ALL SELECT * FROM ins) u
    ORDER BY id
    """,
)
def q_ddl_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] MERGE full-snapshot sync (the CDC apply pattern): one
    statement updates matched rows, inserts new rows, and handles
    STALE target rows via WHEN NOT MATCHED BY SOURCE — delete the 'b'
    ones, flag the rest — the Delta/T-SQL extension over the ANSI
    core. BY SOURCE expressions are fenced to target columns only
    (source columns are definitionally absent on those rows)."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS msync_t")
    eng.sql("DROP TABLE IF EXISTS msync_s")
    eng.sql("CREATE TABLE msync_t (id Int64, tag String, v Int64)")
    eng.sql(
        "INSERT INTO msync_t (id, tag, v) VALUES "
        "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (7, 'b', 70)"
    )
    eng.sql("CREATE TABLE msync_s (id Int64, tag String, v Int64)")
    eng.sql(
        "INSERT INTO msync_s (id, tag, v) VALUES (1, 'a', 11), (4, 'd', 40)"
    )
    eng.sql(
        "MERGE INTO msync_t USING msync_s AS s ON msync_t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (id, tag, v) "
        "VALUES (s.id, s.tag, s.v) "
        "WHEN NOT MATCHED BY SOURCE AND msync_t.tag = 'b' THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'"
    )
    return eng.sql("SELECT id, tag, v FROM msync_t ORDER BY id")
