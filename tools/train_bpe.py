"""Train the committed BPE merge fixture (nutdb_spark/operators/bpe.py).

Standard byte-pair-merge training over the sf0.01 ``documents`` fixture
corpus, with the SAME pre-tokenization the engine applies at encode
time (lowercase, ``[a-z0-9]+`` words; other chars are standalone
tokens and never merge). Determinism: the next merge is the
(count DESC, pair ASC) extreme, so re-running this script reproduces
the committed vocab byte-for-byte.

Usage: python tools/train_bpe.py [n_merges] [parquet_path]
Prints the BPE_MERGES literal to paste into operators/bpe.py.
"""

from __future__ import annotations

import re
import sys
from collections import Counter


def train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    word_freq: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            word_freq[tuple(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for word, f in word_freq.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: Counter[tuple[str, ...]] = Counter()
        for word, f in word_freq.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nxt[tuple(out)] += f
        word_freq = nxt
    return merges


def main() -> None:
    import duckdb

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/testdata/sf0.01/documents.parquet"
    )
    texts = [
        r[0]
        for r in duckdb.sql(f"SELECT text FROM '{path}' ORDER BY doc_id")
        .fetchall()
    ]
    merges = train(texts, n)
    print("BPE_MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")


if __name__ == "__main__":
    main()
