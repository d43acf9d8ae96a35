"""[EXT] Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed aggregations (streaming/windows.py) cover the
declarative cases; these operators cover semantics Structured Streaming
has no built-in for, using Arrow-batched per-key state:

- ``streaming_dedup``: drop events whose id was already seen for the
  key (exactly-once projection over an at-least-once source)
- ``running_totals``: per-key running sum/count emitted per batch

Both run identically under ``foreachBatch``-free streaming with
update-mode sinks; tests drive them with availableNow over the events
fixture and compare against the batch equivalent.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DEDUP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)
_DEDUP_STATE = StructType([StructField("seen", ArrayType(LongType()))])

TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)
_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["event_id"].isin(seen)]
        fresh = fresh.drop_duplicates(subset=["event_id"])
        seen.update(int(x) for x in fresh["event_id"])
        if len(fresh):
            yield fresh[["user_id", "event_id", "value"]]
    state.update((list(seen),))


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Stateful exact dedup by (user_id, event_id) over a stream —
    first occurrence wins, state lives for the stream's lifetime.

    Implemented on the NATIVE streaming ``dropDuplicates`` (JVM state
    store): the original ``applyInPandasWithState`` form
    (``_dedup_fn``, kept for the family's tests) computed the same
    first-seen set but paid one Arrow-boundary pandas frame per user
    per micro-batch — pure per-group Python overhead for an exact
    equality dedup the engine has a keyed-state primitive for. Same
    rows out (first occurrence, batch order), same unbounded-state
    semantics as GroupStateTimeout.NoTimeout; at 100 TB the JVM path
    also drops the per-user Python state ser/deser from the critical
    path. The Python-state showcase family stays exercised by
    running_totals / streaming_funnel / cusum_alerts."""
    return events.select("user_id", "event_id", "value").dropDuplicates(
        ["user_id", "event_id"]
    )


def streaming_dedup_python(events: DataFrame) -> DataFrame:
    """The original applyInPandasWithState form of
    :func:`streaming_dedup` (identical output), kept as the equivalence
    pin for the native rewrite."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_SCHEMA,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _totals_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = (state.get if state.exists else (0, 0.0))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) with persistent state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=TOTALS_SCHEMA,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def make_funnel_schemas(n_steps: int):
    out = StructType(
        [
            StructField("user_id", LongType()),
            StructField("lvl", LongType()),
        ]
    )
    state = StructType([StructField("dp", ArrayType(LongType()))])
    return out, state


def streaming_funnel(events: DataFrame, window: int, n_steps: int) -> DataFrame:
    """[EXT] stateful streaming windowFunnel: per-user conversion depth
    maintained ACROSS micro-batches. Input columns: user_id, t (epoch
    micros) and pre-computed JVM-side booleans c0..c{n-1} (one per
    funnel step). State per user = the batch aggregate's DP vector
    (latest chain-start per step, operators-exact to the batch
    windowFunnel in functions/registry.py); each batch folds its
    events in t order into the carried DP, so after the final batch
    the per-user level equals the batch computation over the full
    history — pytest + driver-oracle pinned. Emits (user_id, lvl) per
    batch; levels are monotone, so the sink's MAX(lvl) per user is
    the final depth.

    Ordering contract: per-user event time must not go backwards
    ACROSS micro-batches (within a batch the fold sorts). File
    sources split by time and Kafka per-key ordering both satisfy
    this — the same contract as any event-time stateful operator
    without a reorder buffer."""
    out_schema, state_schema = make_funnel_schemas(n_steps)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        dp: list = (
            list(state.get[0]) if state.exists else [None] * n_steps
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("t")
            for row in pdf.itertuples(index=False):
                t = int(row.t)
                # descending update: dp[k-1] still holds the
                # PRE-event value, so one event never fills two steps
                for k in range(n_steps - 1, 0, -1):
                    if (
                        getattr(row, f"c{k}")
                        and dp[k - 1] is not None
                        and t - dp[k - 1] <= window
                    ):
                        prev = dp[k - 1]
                        dp[k] = prev if dp[k] is None else max(dp[k], prev)
                if getattr(row, "c0"):
                    dp[0] = t
        state.update((dp,))
        lvl = 0
        for v in dp:
            if v is None:
                break
            lvl += 1
        yield pd.DataFrame({"user_id": [key[0]], "lvl": [lvl]})

    from pyspark.sql import functions as F

    # events matching NO step can never alter the DP — drop them
    # JVM-side before the Python state boundary (scan-side pushdown;
    # at 100 TB this is most of the stream)
    any_step = None
    for k in range(n_steps):
        c = F.col(f"c{k}")
        any_step = c if any_step is None else (any_step | c)
    return (
        events.filter(any_step)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("seen", LongType()),
        StructField("n_alerts", LongType()),
        StructField("s", LongType()),
    ]
)
_CUSUM_STATE = StructType(
    [
        StructField("s", LongType()),
        StructField("n_alerts", LongType()),
        StructField("seen", LongType()),
    ]
)


def make_cusum_fn(target: int, h: int):
    """Per-key one-sided CUSUM drift detector (integer form):
    s' = max(0, s + (x − target)); crossing s' > h raises an alert
    and resets s to 0. Events are processed in ts order WITHIN each
    Arrow batch (sorted here) and across batches by the source's
    time-split file order — CUSUM is order-dependent, so the stream
    contract is time-ordered micro-batches (the replay fixture splits
    by a ts cutoff), unlike the order-free dedup/totals ops."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, n_alerts, seen = (state.get if state.exists else (0, 0, 0))
        for pdf in pdfs:
            for x in pdf.sort_values(["ts", "x"], kind="mergesort")["x"]:
                s = max(0, s + int(x) - target)
                if s > h:
                    n_alerts += 1
                    s = 0
                seen += 1
        state.update((s, n_alerts, seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "seen": [seen],
                "n_alerts": [n_alerts],
                "s": [s],
            }
        )

    return fn


def cusum_alerts(events: DataFrame, *, target: int, h: int) -> DataFrame:
    """Streaming CUSUM per user over an integer measurement column
    `x` ordered by `ts`. Emits the running (seen, n_alerts, s) per
    key per micro-batch (append mode — file sinks accept no updates,
    so every batch's snapshot lands as a new row); the row with the maximum
    `seen` is the final answer — `seen` is monotone, so late sinks
    can always reduce to it."""
    return (
        events.select("user_id", "ts", "x")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_cusum_fn(target, h),
            outputStructType=CUSUM_SCHEMA,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
