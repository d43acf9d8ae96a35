"""Train the committed hashed-linear language-ID classifier
(nutdb_spark/operators/langid_clf.py).

The fastText-style langid stage every multilingual pipeline runs
before per-language sampling: a multi-class linear model over HASHED
unigram+bigram features (the word-n-gram trick is what carries the
language signal — the fixture languages share a vocabulary and differ
in their transition statistics), trained OFFLINE as a deterministic
integer multi-class perceptron and applied in the engine as one
broadcast weight-table join + per-document argmax.

Everything integer and convention-shared with the engine:

- features: unigrams + space-joined bigrams of the normalized
  (lowercase, whitespace-collapsed) text — exactly DSIR's
  featurization (operators/sampling.py dsir_scores),
- hashing: the engine's md5 hash_bucket convention — first 15 hex
  digits of md5(salt || feat) mod DIM — bit-identical in Spark,
  DuckDB and here,
- labels: the fixture documents' `lang` column,
- training: multi-class perceptron, fixed epochs, doc_id order,
  ties broken by LANGS order — rerunning this script reproduces the
  committed weights exactly.

Usage: python tools/train_langid_clf.py [parquet_path]
Prints the LANGID_* literals to paste into operators/langid_clf.py
(weights are emitted SPARSE — only buckets a training update ever
touched; every other bucket's weight is zero by construction).
"""

from __future__ import annotations

import hashlib
import re
import sys

DIM = 4096
SALT = "langid"
EPOCHS = 60
LANGS = ("de", "en", "es", "fr", "zh")


def bucket(feat: str) -> int:
    h = hashlib.md5((SALT + feat).encode()).hexdigest()
    return int(h[:15], 16) % DIM


def featurize(text: str) -> dict[int, int]:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    ws = [w for w in norm.split(" ") if w]
    feats = ws + [a + " " + b for a, b in zip(ws, ws[1:])]
    counts: dict[int, int] = {}
    for f in feats:
        b = bucket(f)
        counts[b] = counts.get(b, 0) + 1
    return counts


def argmax(scores: dict[str, int]) -> str:
    return max(LANGS, key=lambda l: (scores[l], -LANGS.index(l)))


def train(
    rows: list[tuple[int, str, str]],
) -> tuple[dict[str, list[int]], dict[str, int], float]:
    w = {l: [0] * DIM for l in LANGS}
    b = {l: 0 for l in LANGS}
    feats = [(featurize(t), lang) for _, t, lang in rows]
    for _ in range(EPOCHS):
        for x, y in feats:
            scores = {
                l: b[l] + sum(w[l][i] * c for i, c in x.items())
                for l in LANGS
            }
            pred = argmax(scores)
            if pred != y:
                for i, c in x.items():
                    w[y][i] += c
                    w[pred][i] -= c
                b[y] += 1
                b[pred] -= 1
    correct = 0
    for x, y in feats:
        scores = {
            l: b[l] + sum(w[l][i] * c for i, c in x.items()) for l in LANGS
        }
        correct += argmax(scores) == y
    return w, b, correct / len(rows)


def main() -> None:
    import duckdb

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet"
    )
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{path}' ORDER BY doc_id"
    ).fetchall()
    w, b, acc = train(rows)
    sparse = [
        (i, *(w[l][i] for l in LANGS))
        for i in range(DIM)
        if any(w[l][i] for l in LANGS)
    ]
    print(f"# trained on {path}: accuracy {acc:.4f} over {len(rows)} docs")
    print(f"LANGID_DIM = {DIM}")
    print(f"LANGID_SALT = {SALT!r}")
    print(f"LANGID_LANGS = {LANGS!r}")
    print(
        "LANGID_BIAS: tuple[int, ...] = ("
        + ", ".join(str(b[l]) for l in LANGS)
        + ")"
    )
    print(f"# sparse: {len(sparse)} of {DIM} buckets carry weight")
    print("LANGID_ROWS: tuple[tuple[int, ...], ...] = (")
    for row in sparse:
        print(f"    {row!r},")
    print(")")


if __name__ == "__main__":
    main()
