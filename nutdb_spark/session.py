"""SparkSession factory.

The reference is an in-process engine (`/root/reference/Cargo.toml:9`);
our equivalent embedded mode is Spark local[*]. Every lowering is
partition-parallel, so the identical code scales out to a real cluster —
the configs below are chosen to survive a 100 TB deployment:

- AQE on (runtime coalesce, skew-join splitting, dynamic join selection)
- adaptive shuffle partition sizing instead of a fixed magic number
- Arrow for any Python<->JVM data exchange (Pandas UDFs)
- UTC session timezone so timestamp semantics are deployment-independent
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nutdb_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default *).
    On a real cluster, pass ``master=None`` with a pre-configured
    spark-submit environment and the builder inherits it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- scale-critical defaults -----------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # local[] has no separate executors — the driver heap IS the
        # cluster. 20g (box has 128 GiB) keeps a full-suite bench pass
        # out of GC pressure; at r13 close the 375-entry run showed
        # late-suite stateful-stream entries 3-5x their isolated cost
        # under the old 8g heap.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    return builder.getOrCreate()
