"""[EXT] Deterministic BPE tokenization — token-exact packing budgets.

Real context windows are sized in BPE tokens, not whitespace words, so
the packing/chunking operators need a tokenizer whose counts are exact
and replayable in any engine. This module implements greedy byte-pair
ENCODING (applying a trained merge table; training lives in
``tools/train_bpe.py``) entirely JVM-side — nested higher-order-function
folds, zero Python UDFs — with a DuckDB oracle that replays the
identical fold.

Algorithm (classic BPE, e.g. Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"):

- pre-tokenize: lowercase, words are ``[a-z0-9]+`` runs; any other
  non-space char is a standalone token that never merges,
- per word: start from characters, then apply merges **in rank
  order**, each pass replacing adjacent (a, b) pairs left-to-right.

Rank-order application is equivalent to the textbook
min-rank-present-pair iteration FOR TABLES PRODUCED BY BPE TRAINING:
a rule can only mention a token after the rule that builds that token,
so every rule involving the freshly merged token has a later rank and
is still ahead of us. The committed ``BPE_MERGES`` table is exactly
such a table (trained by tools/train_bpe.py on the sf0.01 documents
corpus; re-running the script reproduces it byte-for-byte).

Scale design (the 100 TB shape): ``encode_distinct_words`` runs the
O(R·|word|) fold once per DISTINCT word — vocabulary-sized work, the
same discipline as the bigram LM — and token counts reach documents
through an explode + equi-join + re-aggregate, never a per-row re-fold
of the whole corpus. The direct column fold (``bpe_tokens_text``) is
for short strings / fixture-bounded use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Trained by: python tools/train_bpe.py 48
# (sf0.01 documents corpus, deterministic count-desc/pair-asc ties).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
)

_WORD_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def _merges_lit(merges: tuple[tuple[str, str], ...]) -> Column:
    return F.array(
        *[F.array(F.lit(a), F.lit(b)) for a, b in merges]
    )


# --- separator-string encode (the fast path) ---------------------------------
#
# A token array [t1, t2, ...] is represented as the NUL-separated
# string "\0t1\0t2\0"; applying one greedy-left merge (a, b) is then a
# single native regexp_replace of "\0a\0b" (with a LOOKAHEAD "(?=\0)"
# boundary check, so the shared trailing separator is not consumed and
# a run like [a,a,a,a] still merges pairwise left-to-right exactly as
# the fold does). The whole R-merge encode becomes R nested
# regexp_replace nodes — codegen'd, zero interpreted lambda steps —
# instead of the O(R·len²) CodegenFallback double-fold. Guards keep
# general correctness: a token that CONTAINS the separator (a literal
# NUL in the input, only reachable via single-char non-alnum words) or
# a merge table carrying one falls back to the fold per row.

_SEP = "\x00"


def _merge_patterns(
    merges: tuple[tuple[str, str], ...],
) -> list[tuple[str, str]]:
    import re as _re

    return [
        (
            _re.escape(_SEP + a + _SEP + b) + "(?=" + _re.escape(_SEP) + ")",
            _SEP + a + b,
        )
        for a, b in merges
    ]


def _sep_ok(merges: tuple[tuple[str, str], ...]) -> bool:
    return all(_SEP not in a and _SEP not in b for a, b in merges)


def _fold_word_tokens(
    word: Column, merges: tuple[tuple[str, str], ...]
) -> Column:
    """The original general-path nested fold (see bpe_word_tokens)."""
    chars = F.split(word, "")
    if not merges:  # empty table (training round 0): chars verbatim
        return chars
    return F.aggregate(
        _merges_lit(merges),
        chars,
        lambda toks, pair: F.aggregate(
            toks,
            F.array().cast("array<string>"),
            lambda acc, t: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.element_at(pair, 1))
                & (t == F.element_at(pair, 2)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.concat(
                            F.element_at(pair, 1), F.element_at(pair, 2)
                        )
                    ),
                ),
            ).otherwise(F.concat(acc, F.array(t))),
        ),
    )


def bpe_word_tokens(
    word: Column, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> Column:
    """Token array for ONE pre-tokenized word: chars, then every merge
    in rank order as a left-to-right greedy adjacent-pair fold —
    greedy-left, so a run 'aaa' under ('a','a') gives ['aa','a'],
    matching the trainer's simultaneous left-to-right replacement.

    Stays on the fold: for single-WORD inputs (≤ ~10 chars) the
    per-call overhead of R regexp passes exceeds the fold — measured
    both ways (q_text_token_ids 3.7 → 6.6 s under the regex path);
    the separator-string chain wins only at text granularity
    (``bpe_tokens_text``)."""
    return _fold_word_tokens(word, merges)


def bpe_tokens_text(
    text: Column, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> Column:
    """Full-text encode: pre-tokenize, merge every word, flatten.
    The separator-string fast path runs ONE regexp chain over the
    whole row (words joined by a DOUBLE separator, which no merge
    pattern can bridge), so per-row cost is R native string passes;
    rows containing NUL take the per-word fold path. At corpus scale
    still prefer ``encode_distinct_words`` + join."""
    words = F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)
    fold_all = F.flatten(
        F.transform(words, lambda w: _fold_word_tokens(w, merges))
    )
    if not merges or not _sep_ok(merges):
        return fold_all
    per_word = F.transform(
        words, lambda w: F.concat_ws(_SEP, F.split(w, ""))
    )
    s = F.concat(
        F.lit(_SEP), F.array_join(per_word, _SEP + _SEP), F.lit(_SEP)
    )
    for pat, rep in _merge_patterns(merges):
        s = F.regexp_replace(s, F.lit(pat), F.lit(rep))
    fast = F.filter(F.split(s, _SEP), lambda t: t != F.lit(""))
    return F.when(text.contains(_SEP), fold_all).otherwise(fast)


def bpe_token_count_text(
    text: Column, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> Column:
    return F.size(bpe_tokens_text(text, merges)).cast("long")


def encode_distinct_words(
    df: DataFrame,
    text: Column,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """(word, n_tokens) over the DISTINCT pre-tokenized words of
    ``text`` — the vocabulary-sized table the scale path joins
    against. One shuffle (the distinct)."""
    words = F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)
    return (
        df.select(F.explode(words).alias("word"))
        .distinct()
        .select(
            "word",
            F.size(bpe_word_tokens(F.col("word"), merges)).cast(
                "long"
            ).alias("n_tokens"),
        )
    )


def bpe_token_counts(
    df: DataFrame,
    key: Column,
    text: Column,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """Per-row exact BPE token count at corpus scale: explode words,
    equi-join the distinct-word encodings (vocabulary-sized — Spark
    broadcasts it when small, and at 100 TB a shuffle join on the
    word key is still vocabulary-bounded on one side), re-aggregate.
    Rows with no words count 0. Returns (key, bpe_tokens)."""
    words = F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)
    vocab = encode_distinct_words(df, text, merges)
    exploded = df.select(
        key.alias("__key"), F.explode_outer(words).alias("word")
    )
    return (
        exploded.join(vocab, "word", "left")
        .groupBy("__key")
        .agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias(
                "bpe_tokens"
            )
        )
        .withColumnRenamed("__key", "key")
    )


def bpe_tokens_by_join(
    df: DataFrame,
    key: Column,
    text: Column,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """Per-row FULL token array at corpus scale: positional explode of
    the pre-tokenized words, equi-join the distinct-word encodings,
    reassemble in word order (ordered collect + flatten). Semantically
    identical to ``bpe_tokens_text`` but the O(R·|word|) fold runs
    once per DISTINCT word — the shape a packing writer uses to emit
    actual token streams. Rows with no words get an empty array.
    Returns (key, toks)."""
    words = F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)
    vocab = encode_distinct_words(df, text, merges).select(
        "word", bpe_word_tokens(F.col("word"), merges).alias("__wt")
    )
    keyed = df.select(key.alias("key"), words.alias("__words"))
    joined = (
        keyed.select(
            "key", F.posexplode("__words").alias("__p", "word")
        )
        .join(vocab, "word")
        .groupBy("key")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__p").alias("p"),
                                F.col("__wt").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                )
            ).alias("toks")
        )
    )
    return keyed.select("key").join(joined, "key", "left").select(
        "key",
        F.coalesce(
            F.col("toks"), F.array().cast("array<string>")
        ).alias("toks"),
    )


# --- DuckDB oracle replays -------------------------------------------------


def _merges_sql(merges: tuple[tuple[str, str], ...]) -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return (
        "["
        + ", ".join(f"[{q(a)}, {q(b)}]" for a, b in merges)
        + "]"
    )


def oracle_bpe_tokens_word(
    word_expr: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> str:
    """DuckDB replay of ``bpe_word_tokens``: the same nested fold.
    list_reduce needs acc type == element type, so the outer fold
    prepends the char list to the merge table (both LIST(VARCHAR))
    and the inner fold runs over single-token lists."""
    return f"""list_reduce(
      [string_split({word_expr}, '')] || {_merges_sql(merges)},
      (toks, pair) -> list_reduce(
        [[]::VARCHAR[]] || list_transform(toks, t -> [t]),
        (acc, tl) -> CASE
          WHEN len(acc) > 0 AND acc[-1] = pair[1] AND tl[1] = pair[2]
          THEN acc[:len(acc)-1] || [pair[1] || pair[2]]
          ELSE acc || tl END))"""


def oracle_bpe_tokens_text(
    text_expr: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> str:
    words = (
        f"regexp_extract_all(lower({text_expr}), "
        f"'[a-z0-9]+|[^a-z0-9\\s]')"
    )
    return (
        "flatten(list_transform("
        + words
        + ", w -> "
        + oracle_bpe_tokens_word("w", merges)
        + "))"
    )


def oracle_bpe_token_count_text(
    text_expr: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> str:
    words = (
        f"regexp_extract_all(lower({text_expr}), "
        f"'[a-z0-9]+|[^a-z0-9\\s]')"
    )
    return (
        "CAST(coalesce(list_sum(list_transform("
        + words
        + ", w -> len("
        + oracle_bpe_tokens_word("w", merges)
        + "))), 0) AS BIGINT)"
    )


# --- [EXT] distributed BPE TRAINING ------------------------------------------


def _apply_one_merge(toks: Column, a: str, b: str) -> Column:
    """One greedy-left glue pass of merge (a, b) over a token array —
    the inner fold of ``bpe_word_tokens`` with the pair bound to
    literals. Applying rounds' merges sequentially through this is
    exactly ``bpe_word_tokens``'s rank-order outer fold unrolled.

    Stays on the fold: the trainer's token arrays are single-word
    (short), where the separator-string regexp pass measured slower
    than the glue (q_bpe_train 5.4 → 6.4 s under it)."""
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    df: DataFrame,
    text: Column,
    n_merges: int,
    *,
    merges_prefix: tuple[tuple[str, str], ...] = (),
) -> list[tuple[str, str, int]]:
    """Learn a BPE merge table IN-ENGINE (the distributed sibling of
    tools/train_bpe.py, same algorithm bit-for-bit): per round, count
    every adjacent token pair over the distinct-word frequency table
    and take the (count DESC, pair ASC) extreme.

    Returns ``[(a, b, count), ...]`` — ``n_merges`` rows in rank
    order. ``merges_prefix`` warm-starts from an existing table
    (continue training a committed vocab).

    Scale shape per round: the corpus-sized work happened ONCE (the
    word-frequency groupBy); each round applies ONLY ITS OWN new merge
    to the carried vocabulary-sized token state (one O(|t|) glue fold
    per distinct word — sequential application of glue passes is
    definitionally equal to re-folding the whole prefix from
    characters, which the original implementation did at O(R·|word|)
    PER ROUND, Σr = R²/2 total passes), one pair explode + one
    hash-groupBy over the pair space, and ONE driver-side row (the
    argmax — the k-means bounded-collect precedent). The state is
    ``localCheckpoint(eager=False)``-ed per round, so lineage stays
    one-merge deep and each round's pairs job materializes the new
    state as a side effect.

    Training/encode consistency: ``bpe_word_tokens`` applies merges in
    rank order, which equals the trainer's min-rank iteration for any
    prefix of a trained table — so round ``r``'s carried state is
    exactly the token state the reference trainer sees.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0)
    wf = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    state = wf.select(
        "f", bpe_word_tokens(F.col("w"), tuple(merges_prefix)).alias("t")
    ).localCheckpoint(eager=False)
    learned: list[tuple[str, str]] = list(merges_prefix)
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        idx = F.when(
            F.size("t") >= 2,
            F.sequence(F.lit(1), F.size("t") - 1),
        ).otherwise(F.array().cast("array<int>"))
        pairs = state.select("f", "t", F.explode(idx).alias("i")).select(
            F.element_at("t", F.col("i")).alias("a"),
            F.element_at("t", F.col("i") + 1).alias("b"),
            "f",
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("f").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # pair space exhausted (every word is one token)
        row = best[0]
        learned.append((row["a"], row["b"]))
        out.append((row["a"], row["b"], row["cnt"]))
        state = state.select(
            "f",
            _apply_one_merge(
                F.col("t"), row["a"], row["b"]
            ).alias("t"),
        ).localCheckpoint(eager=False)
    return out


def oracle_bpe_train(n_merges: int, *, where: str = "TRUE") -> str:
    """DuckDB replay of ``bpe_train`` over `documents`: the training
    loop unrolled into one CTE chain — round i counts pairs over the
    token state t_{i-1}, picks the (count DESC, pair ASC) extreme
    b_i, and applies it with the same greedy-left fold the encode
    oracle uses. Returns rows (rk, a, b, cnt) in rank order."""
    parts = [
        f"""WITH w AS (
  SELECT word, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents WHERE {where}) GROUP BY word),
t0 AS (SELECT string_split(word, '') AS t, f FROM w)"""
    ]
    selects = []
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(f) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     j -> [t[j], t[j+1]])) AS pr, f
        FROM t{i - 1})
  GROUP BY a, b),
b{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        if i < n_merges:
            parts.append(
                f"""t{i} AS (
  SELECT list_reduce(
    [[]::VARCHAR[]] || list_transform(t, x -> [x]),
    (acc, tl) -> CASE
      WHEN len(acc) > 0 AND acc[-1] = b{i}.a AND tl[1] = b{i}.b
      THEN acc[:len(acc)-1] || [b{i}.a || b{i}.b]
      ELSE acc || tl END) AS t, f
  FROM t{i - 1}, b{i})"""
            )
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS rk, a, b, cnt FROM b{i}"
        )
    union = "\nUNION ALL\n".join(selects)
    return ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY rk"
