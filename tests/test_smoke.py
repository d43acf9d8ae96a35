from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "suite must not be empty"
    # every oracle refers to a registered query
    assert set(os_) <= set(qs)
