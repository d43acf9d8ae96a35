"""Bucketed co-located joins — the pre-shuffle discipline for
repeated fact-fact joins at scale.

Bucketing pays the join shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
sorted within each bucket, so every later join on that key plans as a
sort-merge join with ZERO Exchange (bucket i joins bucket i locally).
At 100 TB this is the difference between re-shuffling the fact table
on every nightly query and never shuffling it again — the same
discipline the dedup/ANN operators use for their candidate joins.

Spark specifics: bucket metadata lives in the session catalog
(`saveAsTable` + `bucketBy`), `spark.sql.sources.bucketing.enabled`
(default on) lets the scan expose the hash distribution, and a MERGE
hint keeps the planner on sort-merge even when one side would fit a
broadcast — the point here is the co-location, not the small-side
shortcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_N_BUCKETS = 8


def _safe_name(sf_dir: str, table: str, key: str) -> str:
    tag = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").split("/")[-1]
    )
    return f"bkt_{table}_{key}_{tag}_b{_N_BUCKETS}"


def ensure_bucketed(
    spark: SparkSession, df: DataFrame, sf_dir: str, table: str, key: str
) -> DataFrame:
    """Materialize `df` as a bucketed+sorted managed table (once per
    session/scale tag) and return it. The write is the one-time
    shuffle; every subsequent join on `key` is Exchange-free."""
    name = _safe_name(sf_dir, table, key)
    if not spark.catalog.tableExists(name):
        # the in-memory catalog dies with the session but the managed
        # location survives on disk — clear a stale one or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        import shutil

        loc = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(f"{loc.rstrip('/')}/{name}", ignore_errors=True)
        (
            df.write.bucketBy(_N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


def bucketed_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys as a
    sort-merge join. With both sides bucketed the plan contains no
    Exchange (pinned in tests/test_bucketed_join.py)."""
    return left.hint("merge").join(
        right, left[left_key] == right[right_key]
    )


def ensure_partitioned(
    spark: SparkSession, df: DataFrame, sf_dir: str, table: str, key: str
) -> str:
    """Materialize `df` as a hive-partitioned parquet directory (once
    per scale tag) and return its path. Reads that filter on `key`
    prune to the matching directories — the scan never opens the other
    partitions' files (PartitionFilters in the plan), which at 100 TB
    is the first and cheapest scan reducer."""
    import os

    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
        "partitioned",
        f"{table}_{key}_"
        + ("".join(
            c if c.isalnum() else "_"
            for c in sf_dir.rstrip("/").split("/")[-1]
        )),
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        df.write.mode("overwrite").partitionBy(key).parquet(base)
    return base


def plan_compaction(
    manifest: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    *,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction PLANNER — the lakehouse maintenance step
    behind OPTIMIZE (catalog.py's row-level sibling): given a file
    manifest (partition, file id, size), assign every file to an
    output group per partition by the deterministic sequential
    first-fit rule group = floor((cumsum − size) / target) — a file
    joins the group its START offset falls in, so each group holds
    ≤ target bytes plus at most ONE straddling file (the classic
    bounded-overshoot greedy; a single file larger than the target
    gets its own group). File-id order makes the plan reproducible
    across engines and runs.

    Scale shape: one window cumsum per partition (manifests are
    file-counts-sized, millions of rows at 100 TB, not data-sized) —
    a single shuffle on the partition key, no collects."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sz = F.col(size_col).cast("long")
    cum = F.sum(sz).over(w)
    return manifest.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file_id"),
        sz.alias("bytes"),
        F.floor(((cum - sz) / F.lit(target_bytes))).cast("long").alias(
            "grp"
        ),
    )


def compaction_summary(plan: DataFrame) -> DataFrame:
    """Roll a compaction plan up to its output groups: files per
    group, bytes per group — what the rewrite jobs consume."""
    from pyspark.sql import functions as F

    return plan.groupBy("part", "grp").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("grp_bytes"),
    )
