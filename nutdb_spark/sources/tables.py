"""Fixture-table sources.

The driver materializes a TPC-H-ish star schema plus extension tables as
parquet under ``/root/testdata/sf*`` (see FIXTURES.md). Reading goes
through ``spark.read.parquet`` so Catalyst's vectorized reader, filter
pushdown, and column pruning all apply — ``.explain`` on any suite query
should show PushedFilters/ReadSchema reaching the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. No schema inference games — parquet is
    self-describing and the driver wrote canonical types."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, *, register: bool = False
) -> dict[str, DataFrame]:
    """Read all fixture tables; optionally register temp views so
    ``spark.sql`` queries can reference them by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
