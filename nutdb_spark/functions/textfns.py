"""[EXT] LLM-pipeline function names in the dialect registry.

SURVEY.md §2.5: the reference's open `FnName::Others` namespace is the
natural hook for pipeline functions — registering these makes every
operator reachable from dialect SQL text, e.g.:

    SELECT doc_id, languageId(text), simhash(tokenize(text))
    FROM documents WHERE tokenCount(text) > 50

Imported for side effect by nutdb_spark.functions.registry consumers
(the frontend imports this module so the names always resolve).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nutdb_spark.functions.registry import scalar
from nutdb_spark.operators import text as X
from nutdb_spark.operators.dedup import shingles
from nutdb_spark.operators.similarity import (
    cosine_from_scaled,
    dot_scaled,
    lsh_bucket,
    norm_sq_scaled,
    scaled,
)


@scalar("normalizeText")
def _normalize_text(c: Column) -> Column:
    return X.normalize_text(c)


@scalar("tokenize")
def _tokenize(c: Column) -> Column:
    return X.tokenize(c)


@scalar("tokenCount")
def _token_count(c: Column) -> Column:
    return F.size(X.tokenize(c))


@scalar("bpeTokenCount")
def _bpe_token_count(c: Column) -> Column:
    # real greedy byte-pair merges over the committed fixture-trained
    # vocab (operators/bpe.py) — supersedes the regex stand-in, which
    # stays available as bpeIshTokenCount
    from nutdb_spark.operators.bpe import bpe_token_count_text

    return bpe_token_count_text(c)


@scalar("bpeEncode")
def _bpe_encode(c: Column) -> Column:
    from nutdb_spark.operators.bpe import bpe_tokens_text

    return bpe_tokens_text(c)


@scalar("bpeIshTokenCount")
def _bpe_ish_token_count(c: Column) -> Column:
    return F.size(X.bpe_ish_tokens(c))


@scalar("qualityLogit")
def _quality_logit(c: Column) -> Column:
    # hashed-linear quality-classifier inference (operators/quality_clf)
    from nutdb_spark.operators.quality_clf import classifier_logit

    return classifier_logit(c)


@scalar("qualityKeep")
def _quality_keep(c: Column) -> Column:
    from nutdb_spark.operators.quality_clf import classifier_keep

    return classifier_keep(c)


# n-gram width must be known at plan-construction time (the gram
# expression is built per-n), so the registry exposes fixed-n
# spellings rather than an ngrams(tokens, n) with a column n:


@scalar("bigrams")
def _bigrams(tokens: Column) -> Column:
    return X.ngrams(tokens, 2)


@scalar("trigrams")
def _trigrams(tokens: Column) -> Column:
    return X.ngrams(tokens, 3)


@scalar("shingles4")
def _shingles4(text: Column) -> Column:
    return shingles(text, 4)


@scalar("rollingHash")
def _rolling_hash(c: Column) -> Column:
    return X.rolling_hash(c)


@scalar("fingerprint")
def _fingerprint(c: Column) -> Column:
    return X.fingerprint_md5(c)


@scalar("simhash")
def _simhash(tokens: Column) -> Column:
    return X.simhash16(tokens)


@scalar("languageId")
def _language_id(c: Column) -> Column:
    return X.lang_id(c)


@scalar("stopwordRatio")
def _stopword_ratio(tokens: Column) -> Column:
    return X.stopword_ratio(tokens, X.ENGLISH_STOPWORDS)


@scalar("embedCosineSim")
def _embed_cosine_sim(a: Column, b: Column) -> Column:
    """Exact cosine between two array<float> columns (scaled-integer
    convention — deterministic across engines and re-runs)."""
    sa, sb = scaled(a), scaled(b)
    return cosine_from_scaled(
        dot_scaled(sa, sb), norm_sq_scaled(sa), norm_sq_scaled(sb)
    )


@scalar("lshBucket")
def _lsh_bucket(v: Column) -> Column:
    return lsh_bucket(scaled(v))
