"""[EXT] Z-order (Morton) layout clustering — multi-dimensional data
skipping.

The scale problem: a table can be SORTED on only one key. Sorted by
customer, a date-range scan reads every file; sorted by date, a
customer scan does. Z-ordering interleaves the bits of several
bucketized dimensions into one sort key, so consecutive key ranges are
small HYPER-RECTANGLES: each file's per-dimension min/max spans stay
narrow in EVERY ordered dimension at once, and min/max data skipping
(parquet row-group stats / Delta file stats) prunes on any of them.
This is the standard lakehouse layout technique (Morton 1966; Delta
Lake's OPTIMIZE ZORDER BY); the interleave + pruning arithmetic is
pure integer work, so the whole demonstration is engine-exact.

Shapes here:

- ``dim_bucket``: affine bucketization of a column into [0, 2^bits)
  from its 1-row global min/max frame (broadcast; floor-exact by the
  usual gap argument — integer numerator < 2^53, quotient < 2^bits,
  boundary gap >= 1/range >> 2^bits·2^-53),
- ``zorder_key``: bit interleave (literal shifts unrolled Python-side
  — JVM-only integer expressions, no UDF),
- ``layout_prune_stats``: the measurable claim — assign rows to
  equal-width key-range "files" under a layout, collect per-file
  min/max of every dimension, and count how many files a box
  predicate must read. The suite entry compares zorder against both
  single-dimension sorts on a dims-swapped pair of boxes: each linear
  layout wins only its own dimension; z-order prunes on both.

At 100 TB the file assignment is exactly what a sorted write produces
(repartitionByRange(zkey) + sortWithinPartitions); the stats table IS
the file-skipping index (one row per file) and the pruning count is
the fraction of the table a scan touches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_bucket(x: Column, mn: Column, mx: Column, *, bits: int) -> Column:
    """⌊(x − mn)·2^bits / (mx − mn + 1)⌋ — affine integer bucket in
    [0, 2^bits), monotone in x (locality-preserving, unlike a hash)."""
    return (
        F.floor(
            ((x - mn) * F.lit(1 << bits)).cast("double")
            / (mx - mn + F.lit(1))
        )
        .cast("long")
    )


def oracle_dim_bucket(x: str, mn: str, mx: str, *, bits: int) -> str:
    return (
        f"CAST(FLOOR(CAST(({x} - {mn}) * {1 << bits} AS DOUBLE) "
        f"/ ({mx} - {mn} + 1)) AS BIGINT)"
    )


def zorder_key(x: Column, y: Column, *, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide bucket ids: bit i of x
    lands at position 2i, bit i of y at 2i+1. Unrolled literal shifts
    — one flat JVM integer expression."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return out


def oracle_zorder_key(x: str, y: str, *, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def layout_prune_stats(
    rows: DataFrame,
    sort_key: Column,
    *,
    layout: str,
    key_bits: int,
    n_files: int,
    box_x: tuple[int, int],
    box_y: tuple[int, int],
    box_name: str,
) -> DataFrame:
    """One summary row for (layout, box): split the key space into
    ``n_files`` equal-width ranges (what a sorted write yields), take
    per-file min/max of the xb/yb dimension buckets (the file-stats
    index), and count the files whose spans intersect the box — the
    files a stats-pruned scan must read. ``rows`` needs xb/yb columns.
    """
    shift_bits = key_bits - (n_files.bit_length() - 1)
    files = rows.select(
        F.shiftright(sort_key, shift_bits).alias("__file"), "xb", "yb"
    ).groupBy("__file").agg(
        F.min("xb").alias("minx"),
        F.max("xb").alias("maxx"),
        F.min("yb").alias("miny"),
        F.max("yb").alias("maxy"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    hit = (
        (F.col("maxx") >= box_x[0])
        & (F.col("minx") <= box_x[1])
        & (F.col("maxy") >= box_y[0])
        & (F.col("miny") <= box_y[1])
    )
    return files.agg(
        F.lit(layout).alias("layout"),
        F.lit(box_name).alias("box"),
        F.count(F.lit(1)).alias("files_total"),
        F.sum(hit.cast("long")).alias("files_hit"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    ).select("layout", "box", "files_total", "files_hit", "rows_scanned")


def oracle_layout_prune(
    rows_sql: str,
    sort_key: str,
    *,
    layout: str,
    key_bits: int,
    n_files: int,
    box_x: tuple[int, int],
    box_y: tuple[int, int],
    box_name: str,
) -> str:
    """DuckDB twin of ``layout_prune_stats`` over ``rows_sql``
    (must yield xb, yb and the sort-key inputs)."""
    shift_bits = key_bits - (n_files.bit_length() - 1)
    return f"""
  SELECT '{layout}' AS layout, '{box_name}' AS box,
         CAST(COUNT(*) AS BIGINT) AS files_total,
         CAST(SUM(CASE WHEN maxx >= {box_x[0]} AND minx <= {box_x[1]}
                        AND maxy >= {box_y[0]} AND miny <= {box_y[1]}
                  THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
         CAST(SUM(CASE WHEN maxx >= {box_x[0]} AND minx <= {box_x[1]}
                        AND maxy >= {box_y[0]} AND miny <= {box_y[1]}
                  THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM (
    SELECT ({sort_key}) >> {shift_bits} AS f,
           MIN(xb) AS minx, MAX(xb) AS maxx,
           MIN(yb) AS miny, MAX(yb) AS maxy,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM ({rows_sql}) GROUP BY f)"""
