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


def asof_join_any(
    left: DataFrame,
    right: DataFrame,
    *,
    left_keys: list,
    right_keys: list,
    left_ts,
    right_ts,
    how: str = "left",
    strict: bool = False,
    tolerance=None,
    prefix: str = "__asof__",
    direction: str = "backward",
) -> DataFrame:
    """`asof_join` generalized to arbitrary key/ts Column expressions —
    the frontend lowering target for `[LEFT] ASOF JOIN … ON k = k AND
    l.ts >= r.ts` (reference AST `JoinType::AsOf`, query.rs:110).

    Differences from :func:`asof_join`:
    - keys/timestamps are Columns evaluated against each side, so the
      two sides may use different names or computed expressions;
    - EVERY right column comes back, renamed ``prefix + name`` (the
      caller re-aliases; plain names would collide with left columns);
    - SQL equality semantics on keys: right rows with a NULL key or
      NULL timestamp are dropped up front (they can never match), and a
      left row with a NULL key/timestamp matches nothing;
    - ``how='inner'`` drops left rows with no prior right row;
    - ``strict=True`` matches ``left_ts > right_ts`` (an equal-ts
      right row does NOT match) instead of the default ``>=``;
    - ``tolerance`` (optional Column/literal, e.g.
      ``F.expr("INTERVAL 2 HOURS")`` for timestamps or a number for
      numeric ts) bounds the match window: the latest prior right row
      only counts when ``right_ts >= left_ts - tolerance`` — the
      common real-world as-of shape ("the quote within the last N
      minutes, else no match"). Out-of-window left rows get NULL
      right columns (left) or are dropped (inner).

    Same single-shuffle union+window plan as :func:`asof_join` — the
    tolerance adds ONE more last() over the identical window frame
    (the matched right timestamp riding alongside the payload) plus a
    pushed row-local comparison; scale notes there apply unchanged.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof direction must be backward|forward, got {direction!r}"
        )
    lcols = list(left.columns)
    ldt = dict(left.dtypes)
    rcols = list(right.columns)
    rdt = dict(right.dtypes)
    keys = [f"__ak{i}" for i in range(len(left_keys))]
    reserved = set(keys) | {"__ats", "__side", "__p", "__last"}
    clash = reserved & (set(lcols) | set(rcols))
    if clash:
        raise ValueError(
            f"asof_join_any: input columns collide with helper names {sorted(clash)}"
        )
    out_clash = {f"{prefix}{c}" for c in rcols} & set(lcols)
    if out_clash:
        raise ValueError(
            f"asof_join_any: prefixed right columns collide with left columns {sorted(out_clash)}"
        )
    struct_t = "struct<" + ",".join(f"`{c}`:{rdt[c]}" for c in rcols) + ">"
    # At equal ts the right row must sort BEFORE the left row to be
    # visible to the `<=` window (non-strict), and AFTER it to be
    # hidden (strict `<`). Left rows are always tagged 1.
    rside = 2 if strict else 0
    l = left.select(
        *lcols,
        *[k.alias(n) for k, n in zip(left_keys, keys)],
        left_ts.alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_t).alias("__p"),
    )
    r = right.select(
        *[k.alias(n) for k, n in zip(right_keys, keys)],
        right_ts.alias("__ats"),
        F.lit(rside).alias("__side"),
        F.struct(*[F.col(c) for c in rcols]).alias("__p"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols],
    )
    match_cols = [F.col(n) for n in keys] + [F.col("__ats")]
    for c in match_cols:
        r = r.filter(c.isNotNull())
    cols = [*lcols, *keys, "__ats", "__side", "__p"]
    merged = l.select(*cols).unionByName(r.select(*cols))
    # asc NULLS FIRST: a left row with NULL key/ts sorts before every
    # surviving right row in its partition → carries no payload, which
    # is exactly SQL's no-match-on-NULL
    # backward: scan ts ASC, carry the latest right payload forward —
    # matches the latest right_ts <= left_ts. forward: scan ts DESC —
    # "latest in the reversed scan" IS the EARLIEST right_ts >=
    # left_ts. The equal-ts side ordering (rside) makes >=/<= vs >/<
    # in both directions. NULL left ts: asc NULLS FIRST (backward) /
    # desc NULLS FIRST (forward) both park the row before any right
    # payload in scan order, so it carries no match. (desc NULLS LAST
    # would sort a NULL-ts left row AFTER every right row and pick up
    # the earliest right payload — a spurious match.)
    order_ts = (
        F.col("__ats")
        if direction == "backward"
        else F.col("__ats").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_ts, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    if tolerance is not None:
        # the matched right row's timestamp: right rows carry __ats in
        # __rts, so last-non-null over the SAME frame is by construction
        # the timestamp of the row whose payload __last carries
        merged = merged.withColumn(
            "__rts",
            F.when(F.col("__side") != 1, F.col("__ats")),
        ).withColumn(
            "__mts", F.last("__rts", ignorenulls=True).over(w)
        ).withColumn(
            "__last",
            F.when(
                F.col("__mts") >= F.col("__ats") - tolerance
                if direction == "backward"
                else F.col("__mts") <= F.col("__ats") + tolerance,
                F.col("__last"),
            ),
        )
    out = merged.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__last").isNotNull())
    return out.select(
        *lcols,
        *[F.col("__last")[c].alias(f"{prefix}{c}") for c in rcols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    bucket,
) -> DataFrame:
    """`asof_join` for HOT keys: identical semantics, parallel within a
    key.

    The plain operator's per-key window serializes each key into one
    task — fine when keys are many and balanced, a straggler when one
    key holds a large share of the rows. This variant salts the window
    partition with a TIME BUCKET (``bucket``: Column fn ts → bucket id,
    e.g. ``lambda c: F.floor(c / 3600)``), so a hot key splits into
    (key, bucket) slices that run in parallel:

    1. in-bucket pass: the same last-non-null window, partitioned by
       (key, bucket);
    2. carry pass: per (key, bucket) take the latest right payload,
       then roll it forward across the bucket spine with a strictly-
       before window — one row per (key, bucket), thousands of times
       smaller than the data;
    3. stitch: left rows with no in-bucket prior right row take the
       carried payload.

    Cost: one extra small shuffle over the bucket spine. Window state
    per task drops from O(rows-per-key) to O(rows-per-key-bucket).
    """
    lcols = left.columns
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
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
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols if c not in on],
    )
    cols = [*lcols, "__ts", "__side", "__p"]
    merged = (
        l.select(*cols)
        .unionByName(r.select(*cols))
        .withColumn("__b", bucket(F.col("__ts")))
    )
    # 1: within (key, bucket) — parallel slices of the hot key
    w_in = (
        Window.partitionBy(*on, "__b")
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__last_in", F.last("__p", ignorenulls=True).over(w_in)
    )
    # 2: carry across buckets (spine = one row per key x bucket present)
    blast = (
        merged.filter(F.col("__side") == 0)
        .groupBy(*on, "__b")
        .agg(F.max_by("__p", F.col("__ts")).alias("__blast"))
    )
    spine = merged.select(*on, "__b").distinct().join(
        blast, [*on, "__b"], "left"
    )
    w_carry = (
        Window.partitionBy(*on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.withColumn(
        "__carry", F.last("__blast", ignorenulls=True).over(w_carry)
    ).select(*on, "__b", "__carry")
    # 3: stitch
    final = F.coalesce(F.col("__last_in"), F.col("__carry"))
    return (
        merged.filter(F.col("__side") == 1)
        .join(carry, [*on, "__b"], "left")
        .select(
            *lcols,
            *[final[p].alias(f"asof_{p}") for p in payload],
        )
    )
