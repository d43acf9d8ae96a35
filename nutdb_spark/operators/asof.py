"""[EXT] AS-OF join — J9 in SURVEY.md §2.3.

The reference declares `JoinType::AsOf` in its AST
(/root/reference/src/parser/ast/query.rs:110, grammar comment
query.rs:57) but the parser never produces it; we implement the
intended semantics as a first-class operator: match each left row with
the LATEST right row whose timestamp is ≤ the left timestamp, per
equi-key.

Spark lowering is the scale-path union trick, not a range join:
tag + union both sides, then one window per key ordered by
(ts, side) carrying the right payload forward with
last(ignorenulls=True). Cost: a single shuffle on the key — identical
to a plain groupBy — where a naive range join would fan out
quadratically per key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest `payload` columns
    from the right row with right_ts ≤ left_ts (per `on` key); NULL
    payload when no prior right row exists."""
    lcols = left.columns
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
    # One struct carries ALL payload columns atomically: every right row
    # contributes a non-null struct (even if every field inside is NULL),
    # so last(ignorenulls) picks the payload of the single latest right
    # row — NULL fields are preserved and fields never mix across rows.
    struct_t = "struct<" + ",".join(f"`{p}`:{rdt[p]}" for p in payload) + ">"
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_t).alias("__p"),
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(p) for p in payload]).alias("__p"),
        *[
            F.lit(None).cast(ldt[c]).alias(c)
            for c in lcols
            if c not in on
        ],
    )
    cols = [*lcols, "__ts", "__side", "__p"]
    merged = l.select(*cols).unionByName(r.select(*cols))
    # right rows (side 0) sort before left rows at equal ts → `≤` match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__last", F.last("__p", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__last")[p].alias(f"asof_{p}") for p in payload],
    )
    return out
