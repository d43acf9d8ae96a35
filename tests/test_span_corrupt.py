"""Span-corruption armor (operators/text.py span_corrupt_cols).

The oracled entry (q_text_span_corrupt) pins DuckDB bit-identity;
these pin the transform's semantics: a Python replay, the ~15%
corruption rate, sentinel numbering, and the LOSSLESS property — the
input and target splice back into the original word sequence, which
is what makes the pair trainable."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from nutdb_spark.operators.text import (
    SPANC_SPAN,
    SPANC_STRIDE,
    span_corrupt_cols,
)

SF01 = "/root/testdata/sf0.01"


def _off(doc_id: int) -> int:
    h = hashlib.md5(f"spanc{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % SPANC_STRIDE


def _py_corrupt(words: list[str], doc_id: int) -> tuple[str, str, int]:
    off = _off(doc_id)
    inp, tgt, masked = [], [], 0
    for p, w in enumerate(words):
        r = p - off
        if p >= off and r % SPANC_STRIDE == 0:
            k = r // SPANC_STRIDE
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {w}")
            masked += 1
        elif p >= off and 0 < r % SPANC_STRIDE < SPANC_SPAN:
            tgt.append(w)
            masked += 1
        else:
            inp.append(w)
    return " ".join(inp), " ".join(tgt), masked


def _splice(inp: str, tgt: str) -> list[str]:
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in tgt.split(" ") if tgt else []:
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in inp.split(" ") if inp else []:
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        out.extend(spans[int(m.group(1))] if m else [tok])
    return out


def test_span_corrupt_replay_rate_and_losslessness(spark):
    from nutdb_spark.suite import QUERIES

    rows = QUERIES["q_text_span_corrupt"](spark, SF01).collect()
    assert rows
    total = masked = 0
    d = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF01}/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .collect()
    }
    for r in rows:
        words = re.findall(r"[a-z0-9]+", d[r["doc_id"]].lower())
        inp, tgt, n_masked = _py_corrupt(words, r["doc_id"])
        assert (r["input_text"], r["target_text"], r["n_masked"]) == (
            inp,
            tgt,
            n_masked,
        ), r["doc_id"]
        # lossless: splicing target spans back into the input at the
        # sentinels reproduces the original word sequence
        assert _splice(r["input_text"], r["target_text"]) == words
        total += r["n_tokens"]
        masked += r["n_masked"]
    # span/stride = 3/20 -> the canonical ~15% corruption rate
    assert 0.10 < masked / total < 0.20


def test_span_corrupt_plan_is_row_local(spark):
    from nutdb_spark.suite import QUERIES

    plan = (
        QUERIES["q_text_span_corrupt"](spark, SF01)
        ._jdf.queryExecution()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan
