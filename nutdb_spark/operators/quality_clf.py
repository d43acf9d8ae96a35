"""[EXT] Hashed-linear quality-classifier inference.

The one standard LLM-pipeline stage the heuristic quality ladder
(readability, repetition, bigram-LM rarity) doesn't cover: a
fastText-style linear model over hashed token features, trained
OFFLINE (tools/train_quality_clf.py — integer perceptron, 95.2% on
the sf0.01 fixture) and applied in the engine as a pure broadcast dot
product:

    logit(doc) = bias + Σ_word  W[ md5bucket(word) ]
    keep(doc)  = logit > 0

Everything is exact int64 — hashed feature index via the engine's
md5 hash_bucket convention, integer weights summed per occurrence —
so the DuckDB oracle replays it bit-for-bit.

Scale design: the weight table is a 64-int literal folded into the
expression (the broadcast degenerates to a constant array), the whole
classifier is a per-row projection over one HOF fold — no shuffle, no
UDF, scales exactly as the scan. Swapping in a bigger offline model is
a one-literal change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Trained by: python tools/train_quality_clf.py
# (sf0.01 documents corpus; accuracy 0.9520 over 500 docs.)
QCLF_DIM = 64
QCLF_SALT = "qclf"
QCLF_BIAS = -1
QCLF_WEIGHTS: tuple[int, ...] = (
    0, 0, 13, 0, 0, 0, 9, 0,
    0, 0, 8, 0, 34, 0, 0, 0,
    0, 6, 0, 32, 0, 6, 0, 1,
    0, 21, 0, 14, 0, 0, 0, 0,
    0, 0, 0, 18, 0, 20, -79, 0,
    0, 18, 0, 0, 22, 0, 0, -251,
    14, 0, 0, 0, 0, 0, 0, -234,
    -1, 0, 0, 0, 16, -13, 0, 0,
)


def _bucket(word: Column) -> Column:
    h = F.md5(F.concat(F.lit(QCLF_SALT), word))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % QCLF_DIM


def classifier_logit(text: Column) -> Column:
    """Exact integer logit: bias + Σ over words of the hashed-bucket
    weight (per occurrence, which IS the count·weight dot product)."""
    warr = F.array(*[F.lit(int(w)).cast("long") for w in QCLF_WEIGHTS])
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != ""
    )
    return F.aggregate(
        words,
        F.lit(QCLF_BIAS).cast("long"),
        lambda acc, w: acc + F.element_at(warr, (_bucket(w) + 1).cast("int")),
    )


def classifier_keep(text: Column) -> Column:
    return classifier_logit(text) > 0


def oracle_classifier_logit(expr: str) -> str:
    wlist = "[" + ", ".join(str(int(w)) for w in QCLF_WEIGHTS) + "]"
    bucket = (
        f"CAST('0x' || substring(md5('{QCLF_SALT}' || w), 1, 15) "
        f"AS BIGINT) % {QCLF_DIM}"
    )
    return (
        f"CAST({QCLF_BIAS} + coalesce(list_sum(list_transform("
        f"list_filter(string_split_regex(trim({expr}), '\\s+'), "
        f"w -> w != ''), "
        f"w -> ({wlist})[({bucket}) + 1])), 0) AS BIGINT)"
    )


def oracle_classifier_keep(expr: str) -> str:
    return f"({oracle_classifier_logit(expr)} > 0)"
