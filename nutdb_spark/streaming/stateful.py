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
    """Stateful exact dedup by (user_id, event_id) over a stream."""
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
