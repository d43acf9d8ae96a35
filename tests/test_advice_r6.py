"""Behavior pins for the round-5 ADVICE defects.

1. LEFT ASOF JOIN must not silently drop unmatched left rows via a
   left-side-only ON conjunct (lower.py filtered `base` for both kinds).
2. Incremental views must not go permanently stale after base-table
   TRUNCATE / ALTER data rewrites / DROP PARTITION / OPTIMIZE (only the
   insert path refreshed dependents).
3. toDayOfWeek is ISO (Monday=1..Sunday=7), not Spark dayofweek's
   Sunday=1 numbering (ClickHouse dialect semantics).
4. kmeans_assign with fewer input vectors than k clamps k instead of
   IndexError-ing in the centroid update.
5. The ASOF output rename guard must catch a sibling right column whose
   literal name equals another right column's collision target.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from nutdb_spark.engine import NutEngine
from nutdb_spark.frontend.lower import LoweringError

T = dt.datetime


@pytest.fixture()
def eng(spark, sf_dir):
    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


def _rows(df):
    return {tuple(r) for r in df.collect()}


# --- ADVICE 1: LEFT ASOF + left-side-only ON conjunct ----------------------


@pytest.fixture()
def asof_eng(spark, sf_dir):
    e = NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())
    left = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10)), (2, "a", T(2024, 1, 1, 12))],
        "lid int, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [("a", T(2024, 1, 1, 10), 100), ("a", T(2024, 1, 1, 11), 110)],
        "k string, rts timestamp, v int",
    )
    frames = {"a6_l": left, "a6_r": right}
    real = e.resolve_table
    e.resolve_table = lambda name: frames.get(name) or real(name)
    return e


def test_left_asof_rejects_left_side_on_conjunct(asof_eng):
    with pytest.raises(LoweringError, match="LEFT ASOF"):
        asof_eng.sql(
            "SELECT l.lid, r.v FROM a6_l l LEFT ASOF JOIN a6_r r "
            "ON l.k = r.k AND l.lts >= r.rts AND l.lid = 2"
        )
    # the same shape on an INNER asof is fine (filter semantics match)
    out = asof_eng.sql(
        "SELECT l.lid, r.v FROM a6_l l ASOF JOIN a6_r r "
        "ON l.k = r.k AND l.lts >= r.rts AND l.lid = 2"
    )
    assert _rows(out) == {(2, 110)}
    # right-side-only conjuncts stay legal on LEFT ASOF (pre-filtering
    # the right side is correct outer semantics)
    out = asof_eng.sql(
        "SELECT l.lid, r.v FROM a6_l l LEFT ASOF JOIN a6_r r "
        "ON l.k = r.k AND l.lts >= r.rts AND r.v < 105"
    )
    assert _rows(out) == {(1, 100), (2, 100)}


# --- ADVICE 5: ASOF rename duplicate-name guard ----------------------------


def test_asof_duplicate_output_names_rejected(spark, sf_dir):
    e = NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())
    left = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10), 5)], "lid int, k string, lts timestamp, x int"
    )
    # right carries BOTH `x` (collides with left.x → target r_x) and a
    # literal `r_x` (no left collision → target r_x): duplicate finals
    right = spark.createDataFrame(
        [("a", T(2024, 1, 1, 9), 7, 8)],
        "k string, rts timestamp, x int, r_x int",
    )
    frames = {"c6_l": left, "c6_r": right}
    real = e.resolve_table
    e.resolve_table = lambda name: frames.get(name) or real(name)
    with pytest.raises(LoweringError, match="collision"):
        e.sql(
            "SELECT l.lid FROM c6_l l ASOF JOIN c6_r r "
            "ON l.k = r.k AND l.lts >= r.rts"
        )


# --- ADVICE 2: view repair on TRUNCATE / ALTER / OPTIMIZE ------------------


def test_truncate_repairs_incremental_view(eng):
    eng.sql("CREATE TABLE tr_a (k Int32, v Int64)")
    eng.sql(
        "CREATE VIEW tr_v UPDATE BY Summing ORDER BY (k) AS "
        "SELECT k, v FROM tr_a"
    )
    assert eng.catalog._load_meta("tr_v")["maintenance"] == "incremental"
    eng.sql("INSERT INTO tr_a (k, v) VALUES (1, 10), (2, 20)")
    assert _rows(eng.sql("SELECT k, v FROM tr_v")) == {(1, 10), (2, 20)}
    eng.sql("TRUNCATE TABLE tr_a")
    assert eng.sql("SELECT k, v FROM tr_v").count() == 0
    # post-truncate inserts merge into the REBUILT (empty) state
    eng.sql("INSERT INTO tr_a (k, v) VALUES (1, 5)")
    assert _rows(eng.sql("SELECT k, v FROM tr_v")) == {(1, 5)}


def test_drop_partition_repairs_incremental_view(eng):
    eng.sql("CREATE TABLE dp_a (k Int32, v Int64) PARTITION BY k")
    eng.sql(
        "CREATE VIEW dp_v UPDATE BY Summing ORDER BY (k) AS "
        "SELECT k, v FROM dp_a"
    )
    eng.sql("INSERT INTO dp_a (k, v) VALUES (1, 10), (2, 20)")
    eng.sql("ALTER TABLE dp_a DROP PARTITION 1")
    assert _rows(eng.sql("SELECT k, v FROM dp_v")) == {(2, 20)}


def test_optimize_keeps_incremental_view_consistent(eng):
    eng.sql("CREATE TABLE op_a (k Int32, v Int64)")
    eng.sql(
        "CREATE VIEW op_v UPDATE BY Summing ORDER BY (k) AS "
        "SELECT k, v FROM op_a"
    )
    eng.sql("INSERT INTO op_a (k, v) VALUES (1, 10)")
    eng.sql("INSERT INTO op_a (k, v) VALUES (1, 7)")
    eng.sql("OPTIMIZE TABLE op_a")
    assert _rows(eng.sql("SELECT k, v FROM op_v")) == {(1, 17)}


def test_truncate_refreshes_full_view_too(eng):
    eng.sql("CREATE TABLE tf_a (k Int32, name String)")
    eng.sql(
        "CREATE VIEW tf_v UPDATE BY Summing ORDER BY (k) AS "
        "SELECT k, name FROM tf_a"
    )
    assert eng.catalog._load_meta("tf_v")["maintenance"] == "full"
    eng.sql("INSERT INTO tf_a (k, name) VALUES (1, 'x')")
    assert eng.sql("SELECT k FROM tf_v").count() == 1
    eng.sql("TRUNCATE TABLE tf_a")
    assert eng.sql("SELECT k FROM tf_v").count() == 0


# --- ADVICE 3: toDayOfWeek ISO numbering -----------------------------------


def test_to_day_of_week_iso(eng):
    # 2024-01-01 is a Monday (ISO 1); 2024-01-07 is a Sunday (ISO 7).
    # Spark's dayofweek would report 2 and 1 respectively.
    rows = eng.sql(
        "SELECT toDayOfWeek(toDate('2024-01-01')) AS mon, "
        "toDayOfWeek(toDate('2024-01-07')) AS sun "
        "FROM region LIMIT 1"
    ).collect()
    assert (rows[0]["mon"], rows[0]["sun"]) == (1, 7)


# --- ADVICE 4: kmeans with fewer vectors than k ----------------------------


def test_kmeans_fewer_vectors_than_k(spark):
    from nutdb_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame(
        [(1, [0.1] * 64), (2, [0.9] * 64), (3, [0.5] * 64)],
        "vid long, v array<float>",
    )
    out = kmeans_assign(df, "vid", "v", k=8, iters=2).collect()
    assert len(out) == 3
    assert {r["cid"] for r in out} <= {0, 1, 2}


def test_kmeans_empty_input_raises(spark):
    from nutdb_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame([], "vid long, v array<float>")
    with pytest.raises(ValueError, match="no vectors"):
        kmeans_assign(df, "vid", "v", k=4)


def test_rename_table_follows_through_views(eng):
    """ALTER … RENAME must rewrite dependent views' stored queries —
    otherwise the next refresh/delta-merge resolves the dead name."""
    eng.sql("CREATE TABLE rn_a (k Int32, v Int64)")
    eng.sql(
        "CREATE VIEW rn_v UPDATE BY Summing ORDER BY (k) AS "
        "SELECT k, v FROM rn_a"
    )
    eng.sql("INSERT INTO rn_a (k, v) VALUES (1, 10)")
    eng.sql("ALTER TABLE rn_a RENAME TO rn_b")
    # inserts under the NEW name keep maintaining the view
    eng.sql("INSERT INTO rn_b (k, v) VALUES (1, 5), (2, 2)")
    assert _rows(eng.sql("SELECT k, v FROM rn_v")) == {(1, 15), (2, 2)}
