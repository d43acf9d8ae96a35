"""Engine facade: statements whose effects aren't hash-checkable
(EXPLAIN, SET, INSERT…FROM fn, DESCRIBE DATABASE, error behavior)."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def eng(spark, sf_dir):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def test_explain_returns_plan(eng):
    rows = eng.sql("EXPLAIN SELECT count() FROM lineitem").collect()
    text = "\n".join(r["plan"] for r in rows)
    assert "Physical Plan" in text


def test_set_config(eng):
    eng.sql("SET @my_knob = 42")
    assert eng.config["my_knob"] == 42
    eng.sql("SET @spark_sql_shuffle_partitions = 16")
    assert eng.spark.conf.get("spark.sql.shuffle.partitions") == "16"


def test_insert_from_table_fn(eng):
    eng.sql("CREATE TABLE nums (n Int64)")
    eng.sql("INSERT INTO nums (n) FROM numbers(5)")
    got = sorted(r["n"] for r in eng.sql("SELECT n FROM nums").collect())
    assert got == [0, 1, 2, 3, 4]


def test_describe_database_lists_objects(eng):
    eng.sql("CREATE TABLE d1 (x Int32)")
    eng.sql("CREATE VIEW d2 UPDATE BY Summing ORDER BY (x) AS SELECT x, 1 AS c FROM d1")
    rows = {(r["name"], r["type"]) for r in eng.sql("DESCRIBE DATABASE").collect()}
    assert ("d1", "table") in rows and ("d2", "view") in rows


def test_nullability_enforced(eng):
    from nutdb_spark.catalog import CatalogError

    eng.sql("CREATE TABLE nn (a Int32, b Nullable(Int32))")
    eng.sql("INSERT INTO nn (a, b) VALUES (1, NULL)")  # b nullable: ok
    with pytest.raises(CatalogError):
        eng.sql("INSERT INTO nn (a, b) VALUES (NULL, 2)")  # a is not


def test_check_constraint_enforced(eng):
    from nutdb_spark.catalog import CatalogError

    eng.sql("CREATE TABLE ck (v Int32, CONSTRAINT pos CHECK v > 0)")
    eng.sql("INSERT INTO ck (v) VALUES (5)")
    with pytest.raises(CatalogError):
        eng.sql("INSERT INTO ck (v) VALUES (-1)")


def test_serial_ids_unique(eng):
    eng.sql("CREATE TABLE sid (id Serial64, tag String)")
    eng.sql("INSERT INTO sid (tag) VALUES ('a'), ('b'), ('c')")
    eng.sql("INSERT INTO sid (tag) VALUES ('d'), ('e')")
    ids = [r["id"] for r in eng.sql("SELECT id FROM sid").collect()]
    assert len(ids) == len(set(ids)) == 5


def test_drop_partition(eng):
    eng.sql("CREATE TABLE pt (k Int32, v Int32) PARTITION BY k")
    eng.sql("INSERT INTO pt (k, v) VALUES (1, 10), (2, 20), (1, 30)")
    eng.sql("ALTER TABLE pt DROP PARTITION 1")
    rows = eng.sql("SELECT k, v FROM pt").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(2, 20)]


def test_unknown_function_errors(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError):
        eng.sql("SELECT frobnicate(1) FROM region")


def test_query_parameters(eng):
    rows = eng.sql(
        "SELECT c_custkey FROM customer WHERE c_custkey < $0 AND c_nationkey = $1",
        params=[10, 2],
    ).collect()
    assert all(r["c_custkey"] < 10 for r in rows)


def test_parameter_missing_errors(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError):
        eng.sql("SELECT $5 AS x").collect()


def test_view_stays_fresh_on_insert(eng):
    """`UPDATE BY Summing` means MAINTAINED: inserting into a base
    table re-merges every view that references it."""
    eng.sql("CREATE TABLE fv (k Int32, v Int64)")
    eng.sql("INSERT INTO fv (k, v) VALUES (1, 10), (2, 20)")
    eng.sql("CREATE VIEW fvv UPDATE BY Summing ORDER BY (k) AS SELECT k, v FROM fv")
    eng.sql("INSERT INTO fv (k, v) VALUES (1, 5), (3, 7)")
    got = {r["k"]: r["v"] for r in eng.sql("SELECT k, v FROM fvv").collect()}
    assert got == {1: 15, 2: 20, 3: 7}


def test_partitioned_table_prunes(eng):
    """PARTITION BY column → directory layout → Catalyst partition
    pruning on the managed read path."""
    eng.sql("CREATE TABLE ppt (k Int32, v Int64) PARTITION BY k")
    eng.sql("INSERT INTO ppt (k, v) VALUES (1, 10), (2, 20), (1, 30), (3, 40)")
    df = eng.sql("SELECT v FROM ppt WHERE k = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.split("\n") if "FileScan" in l)
    pf = scan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "(k#" in pf and "= 1" in pf  # the filter PRUNES, not scans
    assert "DataFilters: []" in scan
    assert sorted(r["v"] for r in df.collect()) == [10, 30]


def test_function_names_case_insensitive(eng):
    rows = eng.sql(
        "SELECT COUNT() AS n, SUM(c_acctbal) AS s, countunique(c_nationkey) AS u "
        "FROM customer"
    ).collect()
    assert rows[0]["n"] > 0 and rows[0]["u"] == 25


# --- JSON function surface (ClickHouse JSONExtract* family) ---------------


def test_json_extract_through_dialect(eng):
    rows = eng.sql(
        "SELECT JSONExtractInt(props, 'k') AS k, JSONHas(props, 'nope') AS h "
        "FROM events WHERE event_id = 0"
    ).collect()
    assert rows[0]["k"] is not None and rows[0]["h"] is False


def test_json_key_must_be_string_literal(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="string literal"):
        eng.sql("SELECT JSONExtractInt(props, event_type) FROM events")


def test_json_key_rejects_path_injection():
    from nutdb_spark.functions.registry import _json_path

    with pytest.raises(ValueError):
        _json_path("a.b")
    with pytest.raises(ValueError):
        _json_path("a['x']")
    assert _json_path("k") == "$.k"


def test_map_function_surface(eng):
    rows = eng.sql(
        "SELECT mapKeys({'a': 1, 'b': 2}) AS ks, "
        "mapValues({'a': 1, 'b': 2}) AS vs, "
        "mapContains({'a': 1}, 'a') AS has_a, "
        "mapContains({'a': 1}, 'z') AS has_z, "
        "mapLength({'a': 1, 'b': 2}) AS n "
        "FROM numbers(1)"
    ).collect()
    r = rows[0]
    assert sorted(r["ks"]) == ["a", "b"]
    assert sorted(r["vs"]) == [1, 2]
    assert r["has_a"] is True and r["has_z"] is False
    assert r["n"] == 2


# --- [EXT] window functions through the dialect ---------------------------


def test_window_fn_positive(eng):
    rows = eng.sql(
        "SELECT user_id, row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events WHERE user_id = 1"
    ).collect()
    assert sorted(r["rn"] for r in rows) == list(range(1, len(rows) + 1))


def test_window_fn_errors(eng):
    from nutdb_spark.frontend.lower import LoweringError

    with pytest.raises(LoweringError, match="requires ORDER BY"):
        eng.sql("SELECT row_number() OVER (PARTITION BY user_id) FROM events")
    with pytest.raises(LoweringError, match="ROWS frame requires ORDER BY"):
        eng.sql(
            "SELECT sum(value) OVER (PARTITION BY user_id "
            "ROWS UNBOUNDED PRECEDING) FROM events"
        )
    with pytest.raises(LoweringError, match="integer literal"):
        eng.sql(
            "SELECT ntile(user_id) OVER (ORDER BY event_id) FROM events"
        )
    with pytest.raises(LoweringError, match="GROUP BY"):
        eng.sql(
            "SELECT event_type, sum(count(*)) OVER () FROM events "
            "GROUP BY event_type"
        )
    with pytest.raises(LoweringError, match="not a window"):
        eng.sql("SELECT substring(event_type, 1, 2) OVER (ORDER BY ts) FROM events")


# --- [EXT] ARRAY JOIN ------------------------------------------------------


def test_array_join_lockstep_left_and_replace(eng):
    eng.sql("CREATE TABLE ajt (id Int64, xs Array(Int64), ys Array(String))")
    eng.sql(
        "INSERT INTO ajt (id, xs, ys) VALUES "
        "(1, [10, 20], ['a', 'b']), (2, [], [])"
    )
    rows = eng.sql(
        "SELECT id, x, y FROM ajt ARRAY JOIN xs AS x, ys AS y"
    ).collect()
    assert sorted((r["id"], r["x"], r["y"]) for r in rows) == [
        (1, 10, "a"), (1, 20, "b")
    ]
    left = eng.sql("SELECT id, x FROM ajt LEFT ARRAY JOIN xs AS x").collect()
    assert sorted(
        ((r["id"], r["x"]) for r in left),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    ) == [(1, 10), (1, 20), (2, None)]
    rep = eng.sql("SELECT id, xs FROM ajt ARRAY JOIN xs").collect()
    assert sorted((r["id"], r["xs"]) for r in rep) == [(1, 10), (1, 20)]


def test_array_join_expr_requires_alias(eng):
    from nutdb_spark.frontend.parser import ParseError

    with pytest.raises(ParseError, match="AS"):
        eng.sql("SELECT 1 FROM ajt2 ARRAY JOIN [1, 2]")


def test_group_by_with_cube(eng):
    rows = eng.sql(
        "SELECT event_type, user_id % 2 AS par, COUNT(*) AS n "
        "FROM events GROUP BY event_type, user_id % 2 WITH CUBE"
    ).collect()
    # cube = 4 grouping sets; the (NULL, NULL) grand total present once
    totals = [r for r in rows if r["event_type"] is None and r["par"] is None]
    assert len(totals) == 1
    assert totals[0]["n"] == sum(
        r["n"] for r in rows
        if r["event_type"] is not None and r["par"] is not None
    )


def test_qualify_matches_subquery_form(eng):
    q = eng.sql(
        "SELECT user_id, event_id FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) = 1"
    ).collect()
    # exactly one row per user: the earliest event
    assert len({r["user_id"] for r in q}) == len(q)


# --- [EXT] lambdas / higher-order array functions -------------------------


def test_lambda_two_param_zip(eng):
    rows = eng.sql(
        "SELECT arraySum(arrayMap((x, y) -> x * y, [1, 2, 3], [4, 5, 6])) "
        "AS dot FROM numbers(1)"
    ).collect()
    assert rows[0]["dot"] == 32


def test_lambda_shadowing_and_outer_column(eng):
    # lambda param shadows nothing; outer column refs still resolve
    rows = eng.sql(
        "SELECT n_nationkey, "
        "arrayCount(x -> x > n_regionkey, [0, 1, 2, 3, 4]) AS n_gt "
        "FROM nation WHERE n_nationkey < 3"
    ).collect()
    for r in rows:
        assert 0 <= r["n_gt"] <= 5


def test_lambda_first_empty_is_null(eng):
    rows = eng.sql(
        "SELECT arrayFirst(x -> x > 99, [1, 2]) AS f FROM numbers(1)"
    ).collect()
    assert rows[0]["f"] is None


def test_array_join_unequal_lengths_null_fill(eng):
    eng.sql("CREATE TABLE ajx (id Int64, xs Array(Int64), ys Array(String))")
    eng.sql("INSERT INTO ajx (id, xs, ys) VALUES (1, [10, 20, 30], ['a'])")
    rows = eng.sql(
        "SELECT id, x, y FROM ajx ARRAY JOIN xs AS x, ys AS y"
    ).collect()
    assert sorted((r["x"], r["y"]) for r in rows) == [
        (10, "a"), (20, None), (30, None)
    ]


def test_view_with_array_join_stays_correct_on_insert(eng):
    eng.sql("CREATE TABLE ajsrc (tag String, xs Array(Int64))")
    eng.sql(
        "CREATE VIEW ajv UPDATE BY Summing ORDER BY (tag) AS "
        "SELECT tag, x AS v FROM ajsrc ARRAY JOIN xs AS x"
    )
    eng.sql("INSERT INTO ajsrc (tag, xs) VALUES ('a', [1, 2]), ('b', [10])")
    eng.sql("INSERT INTO ajsrc (tag, xs) VALUES ('a', [3])")
    got = {r["tag"]: r["v"] for r in eng.sql("SELECT tag, v FROM ajv").collect()}
    assert got == {"a": 6, "b": 10}


def test_view_with_window_fn_stays_correct_on_insert(eng):
    eng.sql("CREATE TABLE wsrc (tag String, v Int64)")
    eng.sql(
        "CREATE VIEW wv UPDATE BY Summing ORDER BY (tag) AS "
        "SELECT tag, row_number() OVER (PARTITION BY tag ORDER BY v) AS v "
        "FROM wsrc"
    )
    eng.sql("INSERT INTO wsrc (tag, v) VALUES ('a', 5), ('a', 7)")
    eng.sql("INSERT INTO wsrc (tag, v) VALUES ('a', 9)")
    # full recompute each insert: row_numbers over the WHOLE table,
    # summed per tag -> 1+2+3
    got = {r["tag"]: r["v"] for r in eng.sql("SELECT tag, v FROM wv").collect()}
    assert got == {"a": 6}


def test_group_by_with_totals(eng):
    rows = eng.sql(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "GROUP BY event_type WITH TOTALS"
    ).collect()
    detail = [r for r in rows if r["event_type"] is not None]
    total = [r for r in rows if r["event_type"] is None]
    assert len(total) == 1
    assert total[0]["n"] == sum(r["n"] for r in detail)


def test_stat_aggregates_surface(eng):
    # covar/skew/kurt family (CH names onto Spark's population
    # moments; kurtosis is the EXCESS form in both engines). The
    # compare is tolerance-based: Spark's streaming moment updates
    # accumulate rounding even on integer inputs.
    r = eng.sql(
        "select covarPop(n_nationkey, n_regionkey) as cp, "
        "covarSamp(n_nationkey, n_regionkey) as cs, "
        "skewPop(n_nationkey) as sk "
        "from nation"
    ).collect()[0]
    assert abs(r["cp"] - 2.0) < 1e-9
    assert abs(r["cs"] - 50.0 / 24.0) < 1e-9
    assert abs(r["sk"]) < 1e-9  # 0..24 is symmetric
