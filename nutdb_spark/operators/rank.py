"""Distributed exact global ranking.

`Window.orderBy(...)` with no PARTITION BY funnels the whole input
through ONE task — the classic 100 TB scale-killer hiding behind an
innocent-looking window. This module provides the scale-correct
equivalent: exact global `row_number` (and ntile on top of it) as a
fully distributed two-pass plan:

1. `repartitionByRange(keys)` — Spark's range partitioner (sampled
   boundaries) puts partition i's keys wholly before partition i+1's,
   with every partition processed in parallel;
2. `sortWithinPartitions(keys)` — local sort, no shuffle;
3. one SMALL aggregate collects per-partition row counts (exactly
   `numPartitions` rows reach the driver — same bounded-collect
   contract as the catalog's serial-id INSERT path, catalog.py);
4. each row's global rank = cumulative offset of its partition + its
   dense local index, where the local index is
   `monotonically_increasing_id()`'s low 33 bits — which ARE the
   within-partition position after the local sort.

The result is bit-identical to `row_number() OVER (ORDER BY keys)`
whenever `keys` is a total order (include a unique tiebreaker), while
wall-clock scales with partition count instead of collapsing to one
task.

No counterpart in the reference (parser-only, SURVEY §2.6); the
operator backs the engine's analytic entries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["global_row_number", "global_ntile"]


def _resolve(df: DataFrame, keys) -> list[Column]:
    return [F.col(k) if isinstance(k, str) else k for k in keys]


def global_row_number(
    df: DataFrame,
    keys,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over `keys` (ascending), fully
    distributed. `keys` MUST be a total order for a deterministic
    result — pass a unique tiebreaker as the last key."""
    cols = _resolve(df, keys)
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.sortWithinPartitions(*cols)
    # pin the partition layout: the counts job and the ranking job
    # must observe identical partitioning
    ranged = ranged.localCheckpoint(eager=False)

    pid = F.spark_partition_id()
    counts = {
        r["p"]: r["n"]
        for r in ranged.groupBy(pid.alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    # flat array-literal lookup (1-based element_at): constant
    # expression depth at any partition count
    off_arr = F.array(
        *[
            F.lit(offsets.get(p, 0)).cast("long")
            for p in range(max(counts, default=0) + 1)
        ]
    )
    local_idx = F.monotonically_increasing_id() - (
        pid.cast("long") * F.lit(1 << 33)
    )
    return ranged.withColumn(
        out, (F.element_at(off_arr, pid + 1) + local_idx + 1).cast("long")
    )


def global_ntile(
    df: DataFrame,
    keys,
    n: int,
    out: str = "bin",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ntile(n) over `keys` without a single-partition
    window: bin = (rn - 1) * n // total + 1 over the distributed
    global row_number. (This is the equal-width formulation —
    identical to SQL ntile when total % n == 0, and within one row of
    it otherwise; both sides of an oracle check must use the same
    formulation.)"""
    rn = "__rn"
    ranked = global_row_number(df, keys, out=rn, num_partitions=num_partitions)
    total = ranked.count()
    # exact integer arithmetic — float division would misround bin
    # boundaries once totals reach the 2^53 neighborhood
    num = (F.col(rn) - 1) * n
    return ranked.withColumn(
        out, (num - num % total) / total + 1
    ).withColumn(out, F.col(out).cast("long")).drop(rn)
