"""Train the committed hashed-linear quality classifier
(nutdb_spark/operators/quality_clf.py).

The standard pipeline stage: a fastText-style linear model over HASHED
token features, trained OFFLINE, with inference as a pure broadcast
dot product inside the engine. Everything integer:

- features: per-document counts of md5-hash buckets (the engine's
  hash_bucket convention: first 15 hex digits of md5(salt||word) mod
  DIM — bit-identical in Spark, DuckDB and here),
- labels: keep (1) iff boilerplate tokens ('slow','small','dup') are
  ≤ 5% of the document's words — the deterministic stand-in for human
  quality labels (exactly linear in counts, so a separator exists;
  hashing collisions are what the model has to live with),
- training: classic integer perceptron, fixed epochs, doc_id order —
  rerunning this script reproduces the committed weights exactly.

Usage: python tools/train_quality_clf.py [parquet_path]
Prints the QCLF_* literals to paste into operators/quality_clf.py.
"""

from __future__ import annotations

import hashlib
import re
import sys

DIM = 64
SALT = "qclf"
BAD = ("slow", "small", "dup")
EPOCHS = 20


def bucket(word: str) -> int:
    h = hashlib.md5((SALT + word).encode()).hexdigest()
    return int(h[:15], 16) % DIM


def featurize(text: str) -> dict[int, int]:
    counts: dict[int, int] = {}
    for w in re.split(r"\s+", text.strip()):
        if w:
            b = bucket(w)
            counts[b] = counts.get(b, 0) + 1
    return counts


def label(text: str) -> int:
    ws = [w for w in re.split(r"\s+", text.strip()) if w]
    bad = sum(1 for w in ws if w in BAD)
    return 1 if 20 * bad <= len(ws) else 0


def train(rows: list[tuple[int, str]]) -> tuple[list[int], int, float]:
    w = [0] * DIM
    b = 0
    for _ in range(EPOCHS):
        for _, text in rows:
            x = featurize(text)
            y = 1 if label(text) else -1
            logit = b + sum(w[i] * c for i, c in x.items())
            if (logit > 0) != (y > 0):
                for i, c in x.items():
                    w[i] += y * c
                b += y
    correct = sum(
        1
        for _, text in rows
        if (
            (b + sum(w[i] * c for i, c in featurize(text).items())) > 0
        )
        == bool(label(text))
    )
    return w, b, correct / len(rows)


def main() -> None:
    import duckdb

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet"
    )
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{path}' ORDER BY doc_id"
    ).fetchall()
    w, b, acc = train(rows)
    print(f"# trained on {path}: accuracy {acc:.4f} over {len(rows)} docs")
    print(f"QCLF_DIM = {DIM}")
    print(f"QCLF_SALT = {SALT!r}")
    print(f"QCLF_BIAS = {b}")
    print("QCLF_WEIGHTS: tuple[int, ...] = (")
    for i in range(0, DIM, 8):
        print("    " + " ".join(f"{v}," for v in w[i : i + 8]))
    print(")")


if __name__ == "__main__":
    main()
