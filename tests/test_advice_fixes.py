"""Behavior pins for the round-2 ADVICE defects + single-pass INSERT
validation (VERDICT round-2 'What's wrong' #4).

Reference anchors: ragged INSERT rows are a Conflicts parse/bind error
(/root/reference/src/parser/mod.rs:657-664); CHECK/NULL semantics follow
standard SQL (a CHECK evaluating to UNKNOWN passes).
"""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def eng(spark, sf_dir):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir, catalog_dir=tempfile.mkdtemp())


# --- ADVICE 1: INSERT...VALUES arity ---------------------------------------


def test_insert_values_arity_mismatch_raises(eng):
    from nutdb_spark.catalog import CatalogError
    from nutdb_spark.frontend.parser import ParseError

    eng.sql("CREATE TABLE ar (a Int32, b Int32)")
    # ragged rows: parse-time Conflicts error (reference parity)
    with pytest.raises(ParseError, match="arity"):
        eng.sql("INSERT INTO ar (a, b) VALUES (1, 2), (3)")
    # no explicit column list: the parser can't know the table width —
    # bind-time error against the declared (non-serial) columns
    with pytest.raises(CatalogError, match="row 1"):
        eng.sql("INSERT INTO ar VALUES (1, 2, 3), (4, 5, 6)")
    # nothing was written by the failed inserts
    eng.sql("INSERT INTO ar (a, b) VALUES (7, 8)")
    assert eng.sql("SELECT count() AS n FROM ar").collect()[0]["n"] == 1


# --- ADVICE 2: scalar subquery 0-row / multi-row semantics -----------------


def test_scalar_subquery_empty_yields_null(eng):
    rows = eng.sql(
        "SELECT r_name, (SELECT min(n_nationkey) FROM nation "
        "WHERE n_name = 'NOWHERE') AS x FROM region"
    ).collect()
    assert len(rows) == 5  # base rows survive
    assert all(r["x"] is None for r in rows)


def test_scalar_subquery_multi_row_errors(eng):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="more than one row") as ei:
        eng.sql(
            "SELECT r_name, (SELECT n_nationkey FROM nation) AS x FROM region"
        ).collect()
    assert isinstance(ei.value, Py4JJavaError) or "more than one row" in str(
        ei.value
    )


# --- ADVICE 3: dense serial ids across multi-partition sources -------------


def test_serial_ids_dense_across_partitioned_insert_select(eng):
    eng.sql("CREATE TABLE dense (id Serial64, k Int64)")
    # source with far more partitions than rows — the old
    # monotonically_increasing_id scheme produced ids spaced by 2^33
    # here and advanced the counter too little, colliding later
    eng.sql(
        "INSERT INTO dense (k) SELECT o_orderkey FROM orders "
        "WHERE o_orderkey < 40"
    )
    eng.sql("INSERT INTO dense (k) VALUES (100), (101)")
    ids = sorted(r["id"] for r in eng.sql("SELECT id FROM dense").collect())
    n = len(ids)
    assert len(set(ids)) == n  # unique
    assert ids == list(range(1, n + 1))  # dense from 1


# --- ADVICE 5: CHECK evaluating to UNKNOWN passes --------------------------


def test_check_unknown_passes(eng):
    from nutdb_spark.catalog import CatalogError

    eng.sql(
        "CREATE TABLE cknull (v Nullable(Int32), CONSTRAINT pos CHECK v > 0)"
    )
    eng.sql("INSERT INTO cknull (v) VALUES (NULL), (3)")  # UNKNOWN → passes
    with pytest.raises(CatalogError):
        eng.sql("INSERT INTO cknull (v) VALUES (-1)")
    assert eng.sql("SELECT count() AS n FROM cknull").collect()[0]["n"] == 2


# --- single-pass INSERT validation (one aggregate job, not one per rule) ---


def test_insert_validation_is_single_job(eng, spark):
    sc = spark.sparkContext
    eng.sql(
        """
        CREATE TABLE multi (
          a Int32,
          b Enum('x' = 1, 'y' = 2),
          c Chars(8),
          d Int32,
          CONSTRAINT c1 CHECK a > 0,
          CONSTRAINT c2 CHECK d < 100,
          CONSTRAINT c3 CHECK a + d > 0
        )
        """
    )
    sc.setJobGroup("ins-job-count", "insert validation job count")
    try:
        eng.sql(
            "INSERT INTO multi (a, b, c, d) VALUES "
            "(1, 'x', 'aa', 5), (2, 'y', 'bb', 6)"
        )
    finally:
        sc.setJobGroup(None, None)
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
        "ins-job-count"
    )
    # 7 rules used to mean 7 validation scans; now: 1 validation
    # aggregate + 1 write (+ possible AQE stage-materialization jobs for
    # the same aggregate — bounded, not O(rules))
    assert len(jobs) <= 4, f"expected <=4 jobs, saw {len(jobs)}: {jobs}"


# --- ADVICE 4: asof payload atomicity + NULL payload preservation ----------


def test_asof_payload_null_and_atomicity(spark):
    from nutdb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20)], "k int, ts int"
    )
    # latest right row at ts<=20 is ts=15 whose u is NULL and v=7: the
    # old per-column last(ignorenulls) returned the STALE u=3 from ts=5
    # and could mix v from a different row
    right = spark.createDataFrame(
        [(1, 5, 3, 1), (1, 15, None, 7)],
        "k int, ts int, u int, v int",
    )
    out = {
        r["ts"]: (r["asof_u"], r["asof_v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload=["u", "v"],
        ).collect()
    }
    assert out[10] == (3, 1)
    assert out[20] == (None, 7)  # NULL preserved, fields from ONE row


# --- multimodal codec seam: fake + real branches ---------------------------


def test_decode_media_fake_and_stub_branches():
    import pytest as _pytest

    from nutdb_spark.operators.multimodal import decode_media

    assert decode_media(b"abc", "image/png", fake=True) == b"abc"
    # no media libs in this container: the real branch must raise the
    # documented seam error, not return garbage
    with _pytest.raises(NotImplementedError, match="no codec"):
        decode_media(b"abc", "image/png")


def test_decode_media_real_branch_activates_with_library(monkeypatch):
    """Injecting a decoder module makes decode_media use it — the
    try-import seam works without code changes."""
    import sys
    import types

    from nutdb_spark.operators import multimodal

    fake_img = types.ModuleType("PIL.Image")
    decoded = object()
    fake_img.open = lambda bio: (decoded, bio.read())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_img
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_img)

    out = multimodal.decode_media(b"xyz", "image/jpeg")
    assert out == (decoded, b"xyz")
