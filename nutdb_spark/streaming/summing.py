"""[EXT] Incremental Summing-view maintenance (foreachBatch merge).

The batch path (catalog.refresh_view) fully recomputes a
`UPDATE BY Summing` view; this is the incremental path per SURVEY §7.2
M6: maintain the same merged state from a stream, one micro-batch at a
time. Summing merges are associative and commutative (per-key sums), so

    state ⊕ batch  =  groupBy(keys).sum(state ∪ batch-partials)

is exact regardless of batch boundaries — the same property that makes
ClickHouse SummingMergeTree parts mergeable in any order.

State lives as parquet at ``state_path`` with an atomic
tmp-write-then-rename swap per batch (single-writer assumption, which
Structured Streaming's one-query-per-sink guarantees).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summing_merge_batch(
    batch_df: DataFrame, keys: list[str], sums: list[str], state_path: str
) -> None:
    """Merge one micro-batch of raw rows into the summing state."""
    spark = batch_df.sparkSession
    partial = batch_df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sums],
        F.count(F.lit(1)).alias("__n"),
    )
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
        partial = state.unionByName(partial).groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sums],
            F.sum("__n").alias("__n"),
        )
    tmp = state_path + ".tmp"
    partial.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(tmp, state_path)


def incremental_summing(
    stream_df: DataFrame,
    *,
    keys: list[str],
    sums: list[str],
    state_path: str,
    checkpoint: str,
):
    """Attach the Summing merge to a streaming DataFrame; returns the
    started StreamingQuery (availableNow-compatible)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        summing_merge_batch(batch_df, keys, sums, state_path)

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
