"""NutDB-on-Spark engine facade.

``connect()`` is the in-process entry point, mirroring the reference's
embedded-database intent (`/root/reference/Cargo.toml:9` — "in-process
analytical database"): one object wrapping a SparkSession, a managed
catalog (parquet + JSON sidecar metadata), and the dialect frontend.

    eng = connect(data_dir="/root/testdata/sf0.001")
    eng.sql("SELECT count() FROM lineitem").show()

`sql()` returns a DataFrame for queries (laziness preserved), a
DataFrame for DESCRIBE/EXPLAIN, and None for DDL/effects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend.lower import Lowerer, LoweringError
from nutdb_spark.frontend.parser import parse
from nutdb_spark.sources.tables import TABLES, load_table


class NutEngine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        *,
        data_dir: str | None = None,
        catalog_dir: str | None = None,
    ):
        from nutdb_spark.session import get_spark

        self.spark = spark or get_spark("nutdb_engine")
        self.data_dir = data_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
        )
        from nutdb_spark.catalog import Catalog

        self.catalog = Catalog(self.spark, catalog_dir)
        self.config: dict[str, object] = {}

    # --- table resolution -------------------------------------------------

    def resolve_table(self, name: str) -> DataFrame:
        if self.catalog.has_table(name):
            return self.catalog.read_table(name)
        if self.catalog.has_view(name):
            return self.catalog.read_view(name)
        if name in TABLES:
            return load_table(self.spark, self.data_dir, name)
        raise LoweringError(f"unknown table {name!r}")

    # --- entry ------------------------------------------------------------

    def sql(self, text: str, params: list | None = None):
        stmt = parse(text)
        low = Lowerer(self.spark, self.resolve_table, params)
        if isinstance(stmt, A.SelectStmt):
            return low.lower_query(stmt.query)
        if isinstance(stmt, A.ExplainStmt):
            df = low.lower_query(stmt.query)
            plan = df._jdf.queryExecution().toString()
            return self.spark.createDataFrame(
                [(line,) for line in plan.split("\n")], "plan: string"
            )
        if isinstance(stmt, A.InsertStmt):
            self.catalog.insert(stmt, low)
            return None
        if isinstance(stmt, A.CreateTableStmt):
            self.catalog.create_table(stmt.definition)
            return None
        if isinstance(stmt, A.CreateViewStmt):
            self.catalog.create_view(stmt.definition, low)
            return None
        if isinstance(stmt, A.DescribeStmt):
            return self.catalog.describe(stmt, self)
        if isinstance(stmt, A.DropStmt):
            self.catalog.drop(stmt)
            return None
        if isinstance(stmt, A.TruncateStmt):
            self.catalog.truncate(stmt, low)
            return None
        if isinstance(stmt, A.AlterStmt):
            self.catalog.alter(stmt, low)
            return None
        if isinstance(stmt, A.OptimizeStmt):
            self.catalog.optimize(stmt, low)
            return None
        if isinstance(stmt, A.SetStmt):
            value = stmt.value
            if isinstance(value, A.Lit):
                self.config[stmt.name] = value.value
                if str(stmt.name).startswith("spark_"):
                    # @spark_sql_shuffle_partitions ↔ spark.sql.shuffle.partitions
                    key = stmt.name.replace("_", ".")
                    self.spark.conf.set(key, str(value.value))
            else:
                raise LoweringError("SET requires a literal value")
            return None
        raise LoweringError(f"unsupported statement {type(stmt).__name__}")


def connect(**kwargs) -> NutEngine:
    return NutEngine(**kwargs)
