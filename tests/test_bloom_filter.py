"""Runtime bloom-filter injection pin for q_join_bloom_filter.

The default thresholds (creationSideThreshold 10MB on the post-filter
dim, applicationSideScanSizeThreshold 10GB on the fact) rightly refuse
to build a bloom filter over kilobytes of test data, so — exactly like
the AQE skew-join pin — the test lowers them, executes, and restores.
The suite entry's VALUE is threshold-independent (the oracle proves
that); this pins that the PLAN Spark would run at 100 TB carries the
row-level runtime filter.
"""

from __future__ import annotations

from contextlib import contextmanager

SF01 = "/root/testdata/sf0.01"


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_bloom_filter_injected_on_fact_scan(spark):
    from nutdb_spark.suite import QUERIES

    with _confs(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__optimizer__runtime__bloomFilter__"
            "applicationSideScanSizeThreshold": "0",
            "spark__sql__optimizer__runtime__bloomFilter__"
            "creationSideThreshold": "100MB",
        },
    ):
        df = QUERIES["q_join_bloom_filter"](spark, SF01)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan  # probe on the fact side
        assert "bloom_filter_agg" in plan  # build on the filtered dim
        # and it still computes the same thing
        rows = {r["pri"]: (r["n_rows"], r["sum_price"]) for r in df.collect()}
        assert rows and all(n > 0 for n, _ in rows.values())

    # with thresholds back at defaults the filter is (rightly) absent
    df2 = QUERIES["q_join_bloom_filter"](spark, SF01)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan2
