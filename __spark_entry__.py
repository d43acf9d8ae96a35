"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke),
``queries()`` / ``oracle_sql()`` expose the full named suite from
``nutdb_spark.suite`` (one entry per implemented SURVEY.md §2 operator;
the driver hash-compares each against its DuckDB oracle at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (repaired TPC-H Q1) on /root/testdata/sf0.001."""
    from nutdb_spark.suite import QUERIES

    return QUERIES["tpch_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nutdb_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from nutdb_spark.suite import ORACLE

    return dict(ORACLE)
