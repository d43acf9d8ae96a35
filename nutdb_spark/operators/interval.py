"""[EXT] Interval-overlap join — the range-join class, bucketized.

Joining two interval tables on "ranges overlap" (sessions × incident
windows, validity ranges × query times, genomic regions) is the one
join Spark's equi-join machinery can't express directly: the naive
spelling is a theta-join (cartesian + filter) and a sort-based range
join needs a global order. The scale answer is the same one
``grid_neighbor_join`` uses in space: discretize time into fixed
buckets, explode each interval to the buckets it touches, equi-join
on the bucket, and verify the exact predicate on candidates only.
Every overlapping pair shares at least one bucket (the one containing
the later start), and each pair is COUNTED exactly once by anchoring
it to that unique bucket — no post-hoc distinct.

Cost: |intervals| × (span/bucket + 1) exploded rows and a plain
equi-join. Pick ``bucket`` near the typical interval span: hot
buckets (many long concurrent intervals) are hot LSH buckets — the
AQE skew-split / salting toolbox applies unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame, b: DataFrame, *, bucket: int
) -> DataFrame:
    """All (row_a, row_b) pairs whose [start, end] intervals overlap
    (closed ends: touching counts).

    ``a`` must carry long columns ``a_start <= a_end``; ``b`` likewise
    ``b_start <= b_end``; other columns pass through. Coordinates must
    be non-negative (``div`` truncates toward zero, so mixed-sign
    coordinates would mis-bucket — epoch timestamps always qualify).
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")
    ab = a.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.expr(f"a_start div {bucket}"),
                F.expr(f"a_end div {bucket}"),
            )
        ),
    )
    bb = b.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.expr(f"b_start div {bucket}"),
                F.expr(f"b_end div {bucket}"),
            )
        ),
    )
    return (
        ab.join(bb, "__bk")
        .where(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            # anchor each pair to the unique bucket holding the later
            # start — every candidate bucket is examined, exactly one
            # emits the pair
            & (
                F.col("__bk")
                == F.expr(f"greatest(a_start, b_start) div {bucket}")
            )
        )
        .drop("__bk")
    )


__all__ = ["interval_overlap_join"]
