"""[EXT] Domain-mixture reweighting — deterministic Group-DRO /
DoReMi-style multiplicative weights over domain losses.

The published pipeline stage (Xie et al. 2023, "DoReMi: Optimizing
Data Mixtures Speeds Up Language Model Pretraining"; the update rule
is Group DRO, Sagawa et al. 2020): maintain one weight per domain,
each round upweight domains whose loss EXCEEDS the current
mixture-weighted average, renormalize, and train on the resulting
mixture. The loop genuinely iterates — the average moves with the
weights — and converges toward equalizing weighted losses (the
minimax mixture).

Engine-deterministic variant (the exactness choices, documented
because they ARE the dialect):

- the per-domain loss is the negated mean quality-classifier logit
  (operators/quality_clf.py), scaled ×1000 and floored — "hard" =
  low predicted quality; any integer per-domain loss plugs in,
- exp(η·excess) is replaced by the linear factor
  (1000 + ⌊η·excess/spread⌋)/1000 with spread = max(1, Lmax−Lmin) —
  first-order exp, quantized to engine-exact integer arithmetic
  (libm exp is not exactly rounded, so it can't be oracled),
- every division is ⌊a/b⌋ via FLOOR over an IEEE double division.
  That floor is EXACT here, not approximate: |a| < 2^53 keeps the
  operands exact, and a true quotient a/b with b ≤ 10^7 is either an
  integer or at least 1/b ≈ 10⁻⁷ away from one, while the division's
  rounding error is ≤ q·2⁻⁵³ ≈ 10⁻¹² — the floor can't be crossed.
  (Plain integer ``//`` is avoided BECAUSE the engines disagree on
  it: Python floors negative quotients, DuckDB truncates.)

Scale design: the distributed work is one per-domain aggregation over
the corpus (map-side partial); the MW loop itself runs on k domain
rows (k ≤ dozens for any real corpus) — driver-side Python here, the
bounded-collect precedent of bpe_train/k-means, and the DuckDB oracle
replays the loop UNROLLED so the arithmetic is pinned end to end. The
final mixture applies as a broadcast threshold join + hash filter
(the temperature-sampling shape): membership is a pure projection,
append-stable once the weights are frozen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutdb_spark.operators.quality_clf import (
    classifier_logit,
    oracle_classifier_logit,
)

DRO_W0 = 1_000_000  # initial per-domain weight (scaled int)
DRO_ETA = 400  # learning rate, per-mille of the normalized excess
DRO_ROUNDS = 8


def _floordiv(a: int, b: int) -> int:
    """⌊a/b⌋ via double division — the cross-engine convention above.
    (math.floor(a / b), NOT a // b: the engines' integer divisions
    disagree on negative quotients.)"""
    return math.floor(a / b)


def domain_losses(
    df: DataFrame, domain: Column, text: Column
) -> DataFrame:
    """(domain, n_docs, loss): loss = ⌊−1000·Σlogit / n⌋ — negated
    mean classifier logit per domain, floored to an exact integer.
    One map-side-partial groupBy over the corpus; k rows out. The
    domain key is cast to string so any grouping column (int bucket,
    date, enum) feeds the same downstream weight table."""
    per = df.select(
        domain.cast("string").alias("domain"),
        classifier_logit(text).alias("__l"),
    )
    return per.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.floor(
            (F.lit(-1000) * F.sum("__l")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("loss"),
    )


def dro_mixture(
    losses: list[tuple[str, int, int]],
    *,
    rounds: int = DRO_ROUNDS,
    eta: int = DRO_ETA,
    w0: int = DRO_W0,
) -> list[tuple[str, int]]:
    """Run the quantized MW loop over ``[(domain, n_docs, loss)]``;
    returns ``[(domain, w_final)]``. Pure integer arithmetic on k rows
    — the deterministic twin of the unrolled oracle."""
    if not losses:
        return []
    ls = {d: loss for d, _, loss in losses}
    spread = max(1, max(ls.values()) - min(ls.values()))
    w = {d: w0 for d in ls}
    for _ in range(rounds):
        total = sum(w.values())
        lbar = _floordiv(sum(w[d] * ls[d] for d in w), total)
        for d in w:
            factor = 1000 + _floordiv(eta * (ls[d] - lbar), spread)
            w[d] = max(1, _floordiv(w[d] * factor, 1000))
    return sorted(w.items())


def oracle_dro(
    domain_expr: str,
    text_expr: str,
    *,
    table: str = "documents",
    rounds: int = DRO_ROUNDS,
    eta: int = DRO_ETA,
    w0: int = DRO_W0,
) -> str:
    """DuckDB replay: per-domain losses, then the MW loop UNROLLED —
    round i computes the weighted-average loss over w{i-1} and applies
    the quantized factor. Yields (domain, n_docs, loss, w_final)."""
    logit = oracle_classifier_logit(text_expr)
    # AS MATERIALIZED: w{i-1} is referenced twice per round (the
    # average and the update); without the hint DuckDB may inline the
    # chain and re-evaluate the corpus-wide classifier fold 2^rounds
    # times.
    parts = [
        f"""lt AS MATERIALIZED (
  SELECT CAST({domain_expr} AS VARCHAR) AS domain,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(FLOOR(CAST(-1000 * SUM({logit}) AS DOUBLE) / COUNT(*))
              AS BIGINT) AS loss
  FROM {table} GROUP BY domain),
sp AS (
  SELECT GREATEST(1, MAX(loss) - MIN(loss)) AS spread FROM lt),
w0 AS MATERIALIZED (
  SELECT domain, n_docs, loss, CAST({w0} AS BIGINT) AS w FROM lt)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""a{i} AS (
  SELECT CAST(FLOOR(CAST(SUM(w * loss) AS DOUBLE) / SUM(w)) AS BIGINT)
         AS lbar
  FROM w{i - 1}),
w{i} AS MATERIALIZED (
  SELECT domain, n_docs, loss,
         GREATEST(1, CAST(FLOOR(CAST(
             w * (1000 + CAST(FLOOR(CAST({eta} * (loss - a{i}.lbar)
                                    AS DOUBLE) / sp.spread) AS BIGINT))
             AS DOUBLE) / 1000) AS BIGINT)) AS w
  FROM w{i - 1}, a{i}, sp)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT domain, n_docs, loss, w AS w_final FROM w{rounds}"
    )
