"""[EXT] Skew mitigation: salted join.

AQE's skew-join splitting (enabled in the session defaults) handles
most skew at runtime; explicit salting is the plan-level tool for the
pathological case — one key holding a double-digit percentage of a
100 TB fact table, where even a split partition won't fit an executor.

``salted_join`` spreads each hot left-side key over ``salt`` shuffle
partitions (deterministic hash salt — reproducible plans, no rand())
and replicates the right side once per salt value. Right-side cost:
|right| × salt rows through the shuffle — use for dimension-sized right
sides, or pre-filter to the known-hot keys and union with a plain join
for the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's keys salted ``salt`` ways.

    The salt is a deterministic hash of the whole left row (xxhash64
    over all columns), so the same input always produces the same plan
    and the same partition routing — unlike rand()-based salting."""
    l2 = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), salt)
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (l2[left_key] == r2[right_key]) & (l2["__salt"] == r2["__salt"])
    # Force the shuffled path: salting exists to spread a hot SHUFFLE
    # partition, and Catalyst's size estimate of the exploded right
    # side is pre-explode — at scale it would pick (and OOM on) a
    # broadcast of salt× the table. A broadcast join has no skewed
    # partitions to fix in the first place.
    return l2.hint("SHUFFLE_MERGE").join(r2, cond, how).drop("__salt")
