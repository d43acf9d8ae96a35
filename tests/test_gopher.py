"""Gopher/MassiveWeb quality-rule armor (operators/text.py
gopher_rules).

The oracled entry (q_text_gopher) pins DuckDB bit-identity at sf0.01;
these pin the rule VALUES against an independent Python replay on
crafted documents hitting every rule, and that the fixture corpus
gate carries signal (not a constant bit).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nutdb_spark.operators.text import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORD_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    gopher_rules,
)


def _py_rules(text: str) -> dict:
    words = [w for w in re.split(r"\s+", text.strip()) if w]
    n_words = len(words)
    sum_len = sum(len(w) for w in words)
    n_hash = len(re.findall(r"#", text))
    n_ellipsis_sym = len(re.findall(r"\.\.\.", text))
    n_symbols = n_hash + n_ellipsis_sym
    lines = [l for l in text.split("\n") if l.strip()]
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if re.search(r"^\s*[-*]", l))
    n_ellipsis = sum(1 for l in lines if re.search(r"\.\.\.\s*$", l))
    n_alpha = sum(1 for w in words if re.search(r"[A-Za-z]", w))
    lowered = {w.lower() for w in words}
    n_stop = sum(1 for s in GOPHER_STOPWORDS if s in lowered)
    ok = {
        "ok_words": GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS,
        "ok_mean_len": (
            GOPHER_MIN_MEAN_WORD_LEN * n_words
            <= sum_len
            <= GOPHER_MAX_MEAN_WORD_LEN * n_words
        ),
        "ok_symbol": (
            10 * n_hash <= n_words and 10 * n_ellipsis_sym <= n_words
        ),
        "ok_bullet": 10 * n_bullet <= 9 * n_lines,
        "ok_ellipsis": 10 * n_ellipsis <= 3 * n_lines,
        "ok_alpha": 5 * n_alpha >= 4 * n_words,
        "ok_stop": n_stop >= GOPHER_MIN_STOPWORD_HITS,
    }
    return {
        "n_words": n_words,
        "sum_word_len": sum_len,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ellipsis,
        "n_alpha_words": n_alpha,
        "n_stop_hits": n_stop,
        **ok,
        "passes": all(ok.values()),
    }


CRAFTED = [
    # passes everything: 60 words, stopwords, sane lengths
    ("the quick brown fox jumps over " * 10).strip() + " of and that",
    # too short
    "the cat sat of",
    # symbol-heavy (### per word)
    ("the of " + "# " * 40).strip() + " " + "word " * 20,
    # bullet lines dominate (>90%: 19/20 lines bulleted)
    "\n".join(["- item one the of"] * 19 + ["plain line"]),
    # bullet boundary: exactly 90% bulleted now PASSES the rule
    "\n".join(["- item one the of"] * 9 + ["plain line"]),
    # per-symbol split: 0.06+0.06 combined would fail a combined-ratio
    # rule but passes the published per-symbol rule (6 '#', 6 '...'
    # over 100 words)
    ("word " * 88).strip() + " the of " + "# " * 6 + "... " * 6,
    # ellipsis lines dominate
    "\n".join(["trailing off the of..."] * 5 + ["solid line"] * 5),
    # numeric soup fails the alpha rule
    ("12345 67890 " * 30).strip() + " the of",
    # mean word length too long
    (("pneumonoultramicroscopic " * 60).strip() + " the of"),
    # no stopwords at all
    ("alpha beta gamma delta epsilon " * 12).strip(),
    # empty / whitespace
    "",
    "   \n  \n ",
]


def test_rules_match_python_replay(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CRAFTED)], "id long, text string"
    )
    g = gopher_rules(F.col("text"))
    rows = (
        df.select("id", *[c.alias(n) for n, c in g.items()])
        .orderBy("id")
        .collect()
    )
    for row in rows:
        want = _py_rules(CRAFTED[row["id"]])
        got = {k: row[k] for k in want}
        assert got == want, f"doc {row['id']}: {got} != {want}"


def test_published_thresholds_pinned(spark):
    """Pins the Rae et al. 2021 App. A constants directly (not via the
    replay): bullet rejection is >90% of lines, and the 0.1
    symbol-to-word threshold applies to each symbol separately."""
    docs = [
        (0, "\n".join(["- b"] * 19 + ["p"])),   # 95% bullets -> reject
        (1, "\n".join(["- b"] * 9 + ["p"])),    # 90% bullets -> keep
        # 6 '#' + 6 '...' over 102 words: each ratio <= 0.1 -> keep,
        # though the combined 12/102 > 0.1 would fail a combined rule
        (2, ("w " * 88).strip() + " the of " + "# " * 6 + "... " * 6),
        (3, ("w " * 88).strip() + " the of " + "# " * 12),  # 12/102 > 0.1
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    g = gopher_rules(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", g["ok_bullet"].alias("b"), g["ok_symbol"].alias("s")
        ).collect()
    }
    assert rows[0]["b"] is False
    assert rows[1]["b"] is True
    assert rows[2]["s"] is True
    assert rows[3]["s"] is False


def test_fixture_gate_carries_signal(spark, sf_dir):
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = gopher_rules(F.col("text"), stopwords=ENGLISH_STOPWORDS)
    agg = d.select(g["passes"].cast("int").alias("p")).agg(
        F.sum("p").alias("kept"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert 0 < agg["kept"] < agg["n"]


# --- sentiment (shares this file's crafted-replay style) ---------------------


def test_sentiment_matches_python_replay(spark):
    import re as _re

    from nutdb_spark.operators.text import (
        SENTIMENT_LEXICON,
        sentiment_scores,
    )

    lex = dict(SENTIMENT_LEXICON)
    texts = [
        "fast fast big merge",          # pos
        "slow error dup small",          # neg
        "the table row scan",            # neu (no hits)
        "fast slow",                     # 0 with hits -> neu
        "",
    ]

    def replay(t):
        ws = [w for w in _re.split(r"\s+", _re.sub(r"\s+", " ", t.lower()).strip()) if w]
        s = sum(lex.get(w, 0) for w in ws)
        n = sum(1 for w in ws if w in lex)
        return (s, n, "pos" if s > 0 else "neg" if s < 0 else "neu")

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    g = sentiment_scores(F.col("text"))
    rows = (
        df.select("id", *[c.alias(n) for n, c in g.items()])
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert (r["sentiment"], r["n_hits"], r["label"]) == replay(
            texts[r["id"]]
        ), r["id"]


def test_sentiment_fixture_labels_split(spark, sf_dir):
    from nutdb_spark.operators.text import sentiment_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = sentiment_scores(F.col("text"))
    counts = {
        r["label"]: r["n"]
        for r in d.select(g["label"].alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts.get("pos", 0) > 0 and counts.get("neg", 0) > 0
