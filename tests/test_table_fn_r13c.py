"""Dialect-surface armor for the round-13 session-3 table functions
(hllDistinct / domainMixture): arity and argument validation raise
LoweringError; values agree with the Python operators the functions
wrap (each already oracled via its own suite entry — these pin the
dialect plumbing, not the math).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutdb_spark.frontend.lower import LoweringError


@pytest.fixture(scope="module")
def eng(spark):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir="/root/testdata/sf0.001")


def test_hll_distinct_fn(eng, spark):
    with pytest.raises(LoweringError, match="hllDistinct takes"):
        eng.sql("select * from hllDistinct('events', 'event_type')")
    with pytest.raises(LoweringError, match="p must be in"):
        eng.sql(
            "select * from hllDistinct('events', 'event_type', "
            "'user_id', 99)"
        )
    got = eng.sql(
        "select event_type, n_zero, est "
        "from hllDistinct('events', 'event_type', 'user_id', 6) "
        "order by event_type"
    ).collect()
    from nutdb_spark.operators.sketch import hll_estimate, hll_registers

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = (
        hll_estimate(
            hll_registers(e, ["event_type"], F.col("user_id"), p=6),
            ["event_type"],
            p=6,
        )
        .orderBy("event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_domain_mixture_fn(eng, spark):
    with pytest.raises(LoweringError, match="domainMixture takes"):
        eng.sql("select * from domainMixture('documents', 'lang')")
    with pytest.raises(LoweringError, match="rounds must be >= 1"):
        eng.sql(
            "select * from domainMixture('documents', 'lang', 'text', 0)"
        )
    got = eng.sql(
        "select domain, n_docs, loss, w_final "
        "from domainMixture('documents', 'lang', 'text', 4) "
        "order by domain"
    ).collect()
    from nutdb_spark.operators.mixing import domain_losses, dro_mixture

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    losses = sorted(
        (r["domain"], r["n_docs"], r["loss"])
        for r in domain_losses(d, F.col("lang"), F.col("text")).collect()
    )
    w = dict(dro_mixture(losses, rounds=4))
    want = [(dm, n, ls, w[dm]) for dm, n, ls in losses]
    assert [tuple(r) for r in got] == want
    # weights moved off the uniform start (the fixture languages are
    # not equally hard) and every domain keeps positive mass
    assert len({r["w_final"] for r in got}) > 1
    assert all(r["w_final"] >= 1 for r in got)
