"""Relational operators the dialect has but Spark's surface lacks.

Each function is a reusable DataFrame→DataFrame lowering used both by
the suite and by the dialect frontend (nutdb_spark.frontend). All of
them are shuffle-conscious and fully lazy: no lowering ever triggers a
Spark job at plan-construction time, window lowerings partition by the
dialect key, and subquery lowerings become joins Catalyst can broadcast.

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
# (column, ascending) — an order spec entry; plain ColumnLike means asc.
OrderSpec = ColumnLike | tuple[ColumnLike, bool]


def _cols(cols: Sequence[ColumnLike]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _order_specs(order_by: Sequence[OrderSpec]) -> list[tuple[Column, bool]]:
    out: list[tuple[Column, bool]] = []
    for o in order_by:
        if isinstance(o, tuple):
            c, asc = o
            out.append((F.col(c) if isinstance(c, str) else c, asc))
        else:
            out.append((F.col(o) if isinstance(o, str) else o, True))
    return out


def _sort_cols(specs: Sequence[tuple[Column, bool]]) -> list[Column]:
    return [c.asc() if asc else c.desc() for c, asc in specs]


def distinct_on(
    df: DataFrame,
    keys: Sequence[ColumnLike],
    order_by: Sequence[OrderSpec] | None = None,
) -> DataFrame:
    """DISTINCT ON (keys): one row per key.

    With ``order_by`` the kept row is deterministic (first per key) —
    window row_number, one shuffle on the keys. Without an order the
    dialect family leaves the choice unspecified; we use
    ``dropDuplicates`` (no sort, map-side partial dedup — cheaper at
    scale). Expression keys are projected to temp names first so the
    lowering never touches private Column internals.
    """
    if order_by is None:
        key_names: list[str] = []
        tmp: list[str] = []
        out = df
        for i, k in enumerate(keys):
            if isinstance(k, str):
                key_names.append(k)
            else:
                name = f"__dk{i}"
                out = out.withColumn(name, k)
                key_names.append(name)
                tmp.append(name)
        out = out.dropDuplicates(key_names)
        return out.drop(*tmp) if tmp else out
    w = Window.partitionBy(*_cols(keys)).orderBy(*_sort_cols(_order_specs(order_by)))
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def limit_offset(df: DataFrame, n: int, offset: int = 0) -> DataFrame:
    """LIMIT n / LIMIT offset,n / LIMIT n OFFSET o (mod.rs:503-543)."""
    return (df.offset(offset) if offset else df).limit(n)


def _lex_le(specs: Sequence[tuple[Column, bool]], thr: Sequence[Column]) -> Column:
    """Row sort-position <= threshold row's, lexicographic over mixed
    asc/desc keys, matching Spark's null placement (asc→nulls first,
    desc→nulls last)."""
    k, asc = specs[0]
    t = thr[0]
    if asc:
        before = (k.isNull() & t.isNotNull()) | (k < t)
    else:
        before = (t.isNull() & k.isNotNull()) | (k > t)
    if len(specs) == 1:
        return before | k.eqNullSafe(t)
    return before | (k.eqNullSafe(t) & _lex_le(specs[1:], thr[1:]))


def limit_with_ties(
    df: DataFrame, order_by: Sequence[OrderSpec], n: int
) -> DataFrame:
    """LIMIT n WITH TIES: keep rows tying with the n-th per ORDER BY.

    Scale-safe lowering (no global single-partition window): take the
    top-n sort keys (Catalyst: TakeOrderedAndProject — distributed
    top-k), reduce to the n-th key tuple as a 1-row aggregate, broadcast
    it back, and keep every row at-or-before that threshold. Two passes
    over the sort columns only; the full row set is never globally
    sorted except for the final output ordering the dialect demands
    anyway.
    """
    specs = _order_specs(order_by)
    key_names = [f"__k{i}" for i in range(len(specs))]
    keys_df = df.select(*[c.alias(nm) for (c, _), nm in zip(specs, key_names)])
    top_specs = [(F.col(nm), asc) for nm, (_, asc) in zip(key_names, specs)]
    topn = keys_df.orderBy(*_sort_cols(top_specs)).limit(n)
    # The n-th (last) of the top-n is the sort-order-largest row of the
    # top-n frame. Uniform direction → one struct aggregate (struct
    # comparison is lexicographic and treats a null field as smallest,
    # matching asc-nulls-first / desc-nulls-last placement): max(struct)
    # for all-asc, min(struct) for all-desc — a single TakeOrdered pass
    # plus a trivial n-row aggregate. Mixed asc/desc keeps the flip
    # trick (re-sort the n-row frame the opposite way, take row 1).
    dirs = {asc for _, asc in specs}
    if len(dirs) == 1:
        s = F.struct(*[F.col(nm) for nm in key_names])
        nth_struct = (F.max(s) if dirs == {True} else F.min(s)).alias("__nth")
        nth = topn.agg(nth_struct).select(
            *[
                F.col(f"__nth.{nm}").alias(f"__t{i}")
                for i, nm in enumerate(key_names)
            ]
        )
    else:
        flipped = [(F.col(nm), not asc) for nm, (_, asc) in zip(key_names, specs)]
        nth = topn.orderBy(*_sort_cols(flipped)).limit(1)
        nth = nth.select(
            *[F.col(nm).alias(f"__t{i}") for i, nm in enumerate(key_names)]
        )
    thr = [F.col(f"__t{i}") for i in range(len(specs))]
    out = (
        df.join(F.broadcast(nth))
        .filter(_lex_le(specs, thr))
        .drop(*[f"__t{i}" for i in range(len(specs))])
    )
    return out.orderBy(*_sort_cols(specs))


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

    Fully lazy single plan (no job at lowering time):
    - empty subquery  → keep every row (even NULL probe values),
    - any NULL in set → keep nothing (NOT IN is never TRUE),
    - else            → keep non-NULL rows with no match (anti via
                        distinct values + left join + null test).
    The 1-row stats aggregate is broadcast; the value join is a normal
    equi-join Catalyst can broadcast or shuffle. Both the stats and the
    probe derive from ONE shared ``groupBy(__in_val)`` subtree, so the
    subquery is scanned and shuffled once (Spark's ReuseExchange matches
    the identical aggregate subtree; the stats side is a second-level
    1-row rollup of the grouped counts).
    """
    (sub_col,) = sub.columns
    grouped = (
        sub.select(F.col(sub_col).alias("__in_val"))
        .groupBy("__in_val")
        .agg(F.count(F.lit(1)).alias("__in_c"))
    )
    stats = grouped.agg(
        F.coalesce(F.sum("__in_c"), F.lit(0)).alias("__in_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("__in_val").isNull(), F.col("__in_c"))),
            F.lit(0),
        ).alias("__in_nulls"),
    )
    # The probe is the same grouped frame, NULL group included. The join
    # is null-safe (<=>) and the match test reads the count column, so
    # Catalyst can neither push an isnotnull filter into this branch nor
    # prune the count aggregate — the probe subtree stays canonically
    # identical to the stats branch's input and ReuseExchange shares the
    # single scan+shuffle between them.
    probe = grouped.withColumnRenamed("__in_c", "__in_m")
    e = F.col(expr) if isinstance(expr, str) else expr
    keep = (F.col("__in_cnt") == 0) | (
        (F.col("__in_nulls") == 0) & e.isNotNull() & F.col("__in_m").isNull()
    )
    return (
        df.join(F.broadcast(stats))
        .join(probe, e.eqNullSafe(F.col("__in_val")), "left")
        .filter(keep)
        .drop("__in_cnt", "__in_nulls", "__in_val", "__in_m")
    )


def exists_join(df: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    """Correlated EXISTS → left-semi join on the correlation predicate."""
    return df.join(sub, cond, "left_semi")


def not_exists_join(df: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join."""
    return df.join(sub, cond, "left_anti")
