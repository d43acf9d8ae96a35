"""[EXT] Sequence packing — fixed-token-budget chunking for LLM training.

GPT-style training consumes fixed-length sequences built by
concatenating documents in a deterministic order and slicing the
stream every ``budget`` tokens (documents straddle slice boundaries;
nothing is padded or dropped). The operator computes, for every
document, WHERE its tokens land: which sequence it starts in, at what
offset, and how many sequences it spans — a pure layout computation
that downstream writers can use to emit the actual token stream
shard-by-shard.

Determinism + scale come from the same salted-hash discipline as
operators/sampling.py:

- the global order is (shard, h, key) where ``h`` is the salted md5
  bucket of the key — reproducible across engines, re-runs, appends
  do not reorder existing documents *within* a shard prefix,
- the ONLY shuffle is the hash partition on ``shard``; the cumulative
  sum is a per-shard ROWS window (sort within partition, spills to
  disk at scale). There is no global sort and no driver state.
- shards are independent token streams. At 100 TB you size ``shards``
  so one shard's documents fit an executor's sort-spill budget
  (millions of shards is fine — it's one long column); trainers
  already read shard-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutdb_spark.operators.sampling import hash_bucket, oracle_hash_bucket

# Finer grain than sampling's ppm buckets: the hash is the global
# ORDER here, so 10^6 distinct values would (a) collide constantly at
# corpus scale (order then falls to the id tie-break — still
# deterministic, but appends between collided ids shift layouts more
# than necessary) and (b) cap usable shards at 10^6. 10^12 keeps every
# value exact in int64 and supports millions of shards.
PACK_GRAIN = 10**12


def pack_sequences(
    df: DataFrame,
    key: Column,
    n_tokens: Column,
    *,
    budget: int,
    shards: int,
    salt: str = "pack",
) -> DataFrame:
    """Assign every row a (shard, seq, offset) packing position.

    Returns the input columns plus:

    - ``shard``   — which independent token stream the doc belongs to,
    - ``seq``     — 0-based index (within the shard) of the ``budget``-token
      sequence where the document STARTS,
    - ``offset``  — token offset of the document inside that sequence,
    - ``n_seqs``  — how many sequences the document touches (≥2 means it
      straddles a boundary; 0 only for empty documents).

    Layout invariant: concatenating a shard's documents in (h, key)
    order and slicing every ``budget`` tokens reproduces exactly these
    positions.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    h = hash_bucket(key, salt, grain=PACK_GRAIN)
    out = df.withColumn("__h", h).withColumn(
        "__shard", (F.col("__h") % shards).cast("int")
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy("__h", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tokens).over(w)
    return (
        out.withColumn("__cum", cum)
        .withColumn("__start", F.col("__cum") - n_tokens)
        .select(
            *df.columns,
            F.col("__shard").alias("shard"),
            # integral `div`, not floor(a/b): the double round-trip
            # loses exactness past 2^53 cumulative tokens per shard.
            F.expr(f"__start div {budget}").alias("seq"),
            (F.col("__start") % budget).alias("offset"),
            F.when(n_tokens > 0,
                   F.expr(f"(__cum - 1) div {budget}")
                   - F.expr(f"__start div {budget}")
                   + 1)
            .otherwise(F.lit(0))
            .alias("n_seqs"),
        )
    )


__all__ = ["pack_sequences", "PACK_GRAIN"]


def epoch_shuffle(
    df: DataFrame,
    key: Column,
    *,
    epoch: int,
    shards: int,
    salt: str = "epoch",
) -> DataFrame:
    """[EXT] Deterministic per-epoch training-order shuffle: every row
    (a packed sequence, or any keyed unit) gets an epoch-``epoch``
    position — ``eshard`` (which reader's stream it lands in) and
    ``pos`` (its 1-based rank inside that stream). Different epochs
    salt the hash differently, so orders are independent across
    epochs yet bit-reproducible given (salt, epoch, key) — the
    property a resumable trainer needs: re-running epoch 3 after a
    crash replays the identical order, with no RNG state to persist.

    Scale shape: one hash partition on ``eshard`` plus a per-shard
    sort (rank windows never cross shards — the same contract as
    ``pack_sequences``; size ``shards`` so one shard's rows fit an
    executor's sort budget, and readers consume shard-parallel).
    """
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    h = hash_bucket(key, f"{salt}{epoch}", grain=PACK_GRAIN)
    out = df.withColumn("__h", h).withColumn(
        "eshard", (F.col("__h") % shards).cast("int")
    )
    w = Window.partitionBy("eshard").orderBy("__h", key)
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("__h")


def oracle_epoch_shuffle(
    key_expr: str, *, epoch: int, shards: int, salt: str = "epoch"
) -> dict[str, str]:
    """DuckDB expressions for epoch_shuffle's (eshard, pos) columns
    (pos as a window over the enclosing SELECT's rows)."""
    h = oracle_hash_bucket(key_expr, f"{salt}{epoch}", grain=PACK_GRAIN)
    return {
        "eshard": f"CAST(({h}) % {shards} AS INT)",
        "pos": (
            f"CAST(row_number() OVER (PARTITION BY CAST(({h}) % {shards} AS INT) "
            f"ORDER BY {h}, {key_expr}) AS BIGINT)"
        ),
    }
