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


# DataFrame handles are cheap plan objects; caching them avoids paying
# the parquet footer/schema-discovery job once per load_table call.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. No schema inference games — parquet is
    self-describing and the driver wrote canonical types.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; we read it as raw nanos
    (legacy nanosAsLong, a runtime SQL conf — works on any session)
    and truncate to a microsecond timestamp, matching what DuckDB's
    TIMESTAMP_NS→TIMESTAMP cast produces."""
    key = (id(spark), sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div` (double division loses precision at ~1.7e18);
            # NTZ built by pure integer timestampadd so the value is
            # session-timezone-independent (timestamp_micros is LTZ and
            # would shift windows/collect under a non-UTC session)
            df = df.withColumn("ts", F.expr("timestampadd(MICROSECOND, (ts div 1000) % 86400000000, timestampadd(DAY, ts div 86400000000000, TIMESTAMP_NTZ '1970-01-01 00:00:00'))"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _CACHE[key] = df
    return df


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
