"""Relational operators the dialect has but Spark's surface lacks.

Each function is a reusable DataFrame→DataFrame lowering used both by
the suite and by the dialect frontend (nutdb_spark.plans.lower). All of
them are shuffle-conscious: window lowerings partition by the dialect
key (never a global single-partition window unless the dialect demands
a global order), and subquery lowerings become semi/anti joins that
Catalyst can broadcast.

Reference anchors (see SURVEY.md §2):
- DISTINCT ON          -> /root/reference/src/parser/mod.rs:350-356
- LIMIT o,n / WITH TIES-> /root/reference/src/parser/mod.rs:503-543
- RIGHT SEMI/ANTI      -> /root/reference/src/parser/ast/query.rs:107,109
- IN/NOT IN subquery   -> /root/reference/src/parser/ast/item.rs:154-155
- EXISTS/NOT EXISTS    -> /root/reference/src/parser/ast/item.rs:175-176
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnLike = Column | str


def _cols(cols: Sequence[ColumnLike]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def distinct_on(
    df: DataFrame,
    keys: Sequence[ColumnLike],
    order_by: Sequence[ColumnLike] | None = None,
) -> DataFrame:
    """DISTINCT ON (keys): one row per key.

    With ``order_by`` the kept row is deterministic (first per key) —
    window row_number, one shuffle on the keys. Without an order the
    dialect family leaves the choice unspecified; we use
    ``dropDuplicates`` (no sort, cheaper at scale).
    """
    if order_by is None:
        key_names = [c if isinstance(c, str) else c._jc.toString() for c in keys]
        return df.dropDuplicates(key_names)
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def limit_offset(df: DataFrame, n: int, offset: int = 0) -> DataFrame:
    """LIMIT n / LIMIT offset,n / LIMIT n OFFSET o (mod.rs:503-543)."""
    return (df.offset(offset) if offset else df).limit(n)


def limit_with_ties(
    df: DataFrame, order_by: Sequence[ColumnLike], n: int
) -> DataFrame:
    """LIMIT n WITH TIES: keep rows tying with the n-th per ORDER BY.

    rank() over a global order — the window is unavoidable (the dialect
    demands a total order anyway); Catalyst plans a single range-
    partitioned sort, same cost class as the ORDER BY itself.
    """
    w = Window.orderBy(*_cols(order_by))
    return (
        df.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
        .orderBy(*_cols(order_by))
    )


def right_semi(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """RIGHT SEMI JOIN — Spark has no right_semi; swap sides (J6)."""
    return right.join(left, on, "left_semi")


def right_anti(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """RIGHT ANTI JOIN — swap sides (J8)."""
    return right.join(left, on, "left_anti")


def in_subquery(df: DataFrame, expr: ColumnLike, sub: DataFrame) -> DataFrame:
    """``expr IN (SELECT c FROM …)`` → left-semi join (broadcastable)."""
    (sub_col,) = sub.columns
    probe = sub.select(F.col(sub_col).alias("__in_val")).distinct()
    e = F.col(expr) if isinstance(expr, str) else expr
    return df.join(probe, e == F.col("__in_val"), "left_semi")


def not_in_subquery(df: DataFrame, expr: ColumnLike, sub: DataFrame) -> DataFrame:
    """``expr NOT IN (SELECT c …)`` with SQL three-valued semantics.

    If the subquery yields ANY null, NOT IN is never true; rows whose
    probe value is null are also dropped. A bare anti-join gets this
    wrong — we add the null guards explicitly (SURVEY §7.3 item 3).
    """
    (sub_col,) = sub.columns
    probe = sub.select(F.col(sub_col).alias("__in_val")).distinct()
    e = F.col(expr) if isinstance(expr, str) else expr
    has_null = probe.filter(F.col("__in_val").isNull()).limit(1).count() > 0
    if has_null:
        return df.limit(0)
    return df.filter(e.isNotNull()).join(
        probe, e == F.col("__in_val"), "left_anti"
    )


def exists_join(df: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    """Correlated EXISTS → left-semi join on the correlation predicate."""
    return df.join(sub, cond, "left_semi")


def not_exists_join(df: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join."""
    return df.join(sub, cond, "left_anti")
