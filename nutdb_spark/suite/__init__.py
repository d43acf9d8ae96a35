"""The engine's named query suite — the driver contract surface.

Every operator row in SURVEY.md §2 registers a named query here (via
``nutdb_spark.suite.registry.query``) together with an ANSI-SQL oracle
string DuckDB can run on the same parquet fixtures. ``__spark_entry__``
re-exports these dicts.
"""

from __future__ import annotations

import importlib

from nutdb_spark.suite.registry import ORACLE, QUERIES

# Import for side effect: each module registers its queries.
_MODULES = (
    "nutdb_spark.suite.tpch",
    "nutdb_spark.suite.query_core",
    "nutdb_spark.suite.joins",
    "nutdb_spark.suite.expressions",
    "nutdb_spark.suite.functions_suite",
    "nutdb_spark.suite.dedup",
    "nutdb_spark.suite.similarity",
    "nutdb_spark.suite.text",
    "nutdb_spark.suite.streaming_suite",
    "nutdb_spark.suite.multimodal_suite",
    "nutdb_spark.suite.sql_suite",
    "nutdb_spark.suite.ddl_suite",
)

for _m in _MODULES:
    try:
        importlib.import_module(_m)
    except ModuleNotFoundError as ex:
        # Only tolerate the suite module itself being absent; a missing
        # transitive import inside an existing module is a real bug and
        # must not silently shrink the graded suite.
        if ex.name != _m:
            raise

__all__ = ["QUERIES", "ORACLE"]
