"""[EXT] Text-analysis operators for LLM training-data pipelines.

All lowerings are pure JVM-side expression compositions (whole-stage
codegen; no Python UDFs in any hot path) and deliberately use only
cross-engine-deterministic primitives (md5, integer polynomial hashing,
regex splits) so every operator has an exact DuckDB oracle — the same
property that makes results reproducible across cluster re-runs at
100 TB, where partition order is never stable.

Extension scope per SURVEY.md §2.5 [EXT]; no reference counterpart
(the reference is a SQL parser only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps the Horner accumulator in bigint range
# (acc*31 + 127 < 2^36) while giving a well-mixed 31-bit hash.
HASH_MOD = 2_147_483_647

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language ID. Deterministic and SQL-expressible by construction.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "es": ("el", "la", "los", "las", "y", "un", "una", "es"),
}

ENGLISH_STOPWORDS = LANG_PROFILES["en"] + ("that", "it", "on", "with", "as")


def normalize_text(col: Column) -> Column:
    """normalizeText: lowercase, collapse runs of whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def oracle_normalize(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def tokenize(col: Column) -> Column:
    """tokenize: whitespace word split of the trimmed text."""
    return F.split(F.trim(col), r"\s+")


def oracle_tokenize(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def bpe_ish_tokens(col: Column) -> Column:
    """Sub-word-ish regex tokenization (BPE-ish): word pieces of ≤4
    chars plus standalone punctuation — a deterministic stand-in for a
    real BPE vocab with the same Spark-side shape (array<string>)."""
    return F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"), 0)


def oracle_bpe_ish(expr: str) -> str:
    return f"regexp_extract_all({expr}, '[A-Za-z0-9]{{1,4}}|[^A-Za-z0-9\\s]')"


def ngrams(tokens: Column, n: int) -> Column:
    """n-grams over a token array (space-joined).

    Built from arrays_zip of shifted slices, NOT element_at inside a
    transform lambda: arguments of zip/slice are evaluated once per
    ROW, while an outer-array reference inside a lambda is re-evaluated
    once per ELEMENT — with a derived token array that multiplies the
    whole upstream expression by the gram count (measured 4-10× slower
    at sf0.1). Trailing zip entries padded with null are sliced off.
    """
    # explicit positional aliases: arrays_zip names struct fields after
    # its inputs, so a plain column reference would otherwise produce a
    # field named after the column instead of "0"
    shifted = [tokens.alias("0")] + [
        F.slice(
            tokens, j + 1, F.greatest(F.size(tokens) - j, F.lit(0))
        ).alias(str(j))
        for j in range(1, n)
    ]
    z = F.arrays_zip(*shifted)
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )
    return F.when(
        F.size(tokens) >= n,
        F.slice(grams, 1, F.greatest(F.size(tokens) - (n - 1), F.lit(0))),
    ).otherwise(F.array().cast("array<string>"))


def oracle_ngrams(words_expr: str, n: int) -> str:
    parts = " || ' ' || ".join(
        f"{words_expr}[i]" if j == 0 else f"{words_expr}[i+{j}]" for j in range(n)
    )
    return (
        f"list_transform(range(1, greatest(len({words_expr})-{n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


def rolling_hash(col: Column) -> Column:
    """31-bit polynomial (Horner) rolling hash of a string — the
    document-fingerprint primitive. Exact integer arithmetic, identical
    in any engine: h = fold(chars, acc -> (acc*31 + code) % (2^31-1))."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.ascii(F.substring(col, i, 1)).cast("long"),
    )
    return F.when(F.length(col) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + c) % HASH_MOD,
        )
    )


def oracle_rolling_hash(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(unicode(substring({expr}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {HASH_MOD}) END"
    )


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (dedup key)."""
    return F.md5(normalize_text(col))


def oracle_fingerprint_md5(expr: str) -> str:
    return f"md5({oracle_normalize(expr)})"


def stopword_ratio(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords (lowercased membership)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def oracle_stopword_ratio(words_expr: str, stopwords: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{s}'" for s in stopwords)
    return (
        f"len(list_filter({words_expr}, t -> list_contains([{lst}], lower(t)))) "
        f"* 1.0 / greatest(len({words_expr}), 1)"
    )


def quality_metrics(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set: length, token count, mean token
    length, punctuation ratio, stopword ratio. The division order is
    fixed so doubles are bit-identical cross-engine."""
    toks = tokenize(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": (
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            )
            / F.greatest(n_tokens, F.lit(1))
        ),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stopword_ratio(toks, ENGLISH_STOPWORDS),
    }


def lang_id(text: Column) -> Column:
    """languageId: stopword-profile heuristic — argmax of per-language
    stopword-hit ratio with a deterministic tie order (en>de>fr>es),
    'und' (undetermined) when nothing matches."""
    toks = tokenize(text)
    scores = {
        lang: stopword_ratio(toks, words) for lang, words in LANG_PROFILES.items()
    }
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def oracle_lang_id(words_expr: str) -> str:
    r = {
        lang: oracle_stopword_ratio(words_expr, words)
        for lang, words in LANG_PROFILES.items()
    }
    return (
        f"CASE WHEN ({r['en']}) >= ({r['de']}) AND ({r['en']}) >= ({r['fr']}) "
        f"AND ({r['en']}) >= ({r['es']}) AND ({r['en']}) > 0 THEN 'en' "
        f"WHEN ({r['de']}) >= ({r['fr']}) AND ({r['de']}) >= ({r['es']}) "
        f"AND ({r['de']}) > 0 THEN 'de' "
        f"WHEN ({r['fr']}) >= ({r['es']}) AND ({r['fr']}) > 0 THEN 'fr' "
        f"WHEN ({r['es']}) > 0 THEN 'es' ELSE 'und' END"
    )


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over token rolling-hashes: bit j is set when the
    sum over tokens of ±1 (by bit j of the token hash) is positive.
    Token hashes are computed once and reused across the 16 bit sums."""
    hashes = F.transform(tokens, rolling_hash)

    def balance(j: int) -> Column:
        # factory so the merge lambda keeps exactly 2 params (PySpark
        # derives lambda-variable count from the signature; a `j=j`
        # default would be miscounted as a third lambda variable)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    out = F.lit(0).cast("long")
    for j in range(16):
        out = out + F.when(balance(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def oracle_token_hashes(words_expr: str) -> str:
    """DuckDB list of per-token rolling hashes (the `rolling_hash` twin
    mapped over a word list). Factored out so multi-bit consumers can
    compute it ONCE in a CTE instead of once per bit."""
    return (
        "list_transform({w}, t -> CASE WHEN length(t) = 0 THEN 0 ELSE "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, length(t) + 1), "
        "i -> CAST(unicode(substring(t, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {HASH_MOD}) END)"
    ).format(w=words_expr)


def oracle_token_hashes_md5(words_expr: str) -> str:
    """DuckDB twin of the md5 token hash (`simhash_df(token_hash="md5")`):
    first 15 hex digits of md5 parsed as a base-16 BIGINT."""
    return (
        "list_transform({w}, t -> list_reduce("
        "list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, 16), "
        "i -> CAST(strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1 "
        "AS BIGINT))), (a, d) -> a * 16 + d))"
    ).format(w=words_expr)


def oracle_simhash_bits(hashes_expr: str, bits: int) -> str:
    """SimHash fingerprint from an ALREADY-COMPUTED hash-list column."""
    parts = " + ".join(
        f"(CASE WHEN CAST(list_sum(list_transform({hashes_expr}, "
        f"h -> ((h >> {j}) & 1) * 2 - 1)) AS BIGINT) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"({parts})"


def oracle_simhash(words_expr: str, bits: int = 16) -> str:
    return oracle_simhash_bits(oracle_token_hashes(words_expr), bits)


def oracle_simhash16(words_expr: str) -> str:
    return oracle_simhash(words_expr, 16)


def term_stats(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    *,
    min_len: int = 4,
    top_per_doc: int = 3,
) -> "DataFrame":
    """TF-IDF building block, exact-integer form: per-document top
    terms with term frequency (tf) and document frequency (df).

    The idf itself (ln N/df) is left to the consumer: a float log
    differs in the last ulp across engines' libm, which would break the
    bit-exact oracle contract, while (tf, df, N) carries the identical
    information losslessly. Ranking is (tf desc, term asc) — a
    deterministic keyword extraction.

    Scale shape: explode → two hash-groupBys (doc,term) and (term),
    both map-side partial; the df join shuffles on the term key; the
    per-doc top-k is a bounded window. No collects, no UDFs — entirely
    whole-stage codegen.
    """
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(normalize_text(F.col(text_col)))).alias(
                "term"
            ),
        )
        .filter(F.length("term") >= min_len)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_per_doc)
        .select("doc_id", "term", "tf", "df", "rank")
    )


# --- PII scrubbing ---------------------------------------------------------

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# treat identically: char classes, bounded repeats, \b. No lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+\d{1,3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def redact_pii(col: Column) -> Column:
    """Replace emails, phone numbers, and IPv4 addresses with typed
    placeholder tokens. Order matters: emails first (their domains
    contain dot-digit runs an IP pattern could nibble), then phones,
    then bare IPs. Pure JVM regexp_replace chain — codegen, no UDF,
    scales like the scan."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def oracle_redact_pii(expr: str) -> str:
    out = expr
    for pat, token in PII_PATTERNS.values():
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts over the ORIGINAL text (audit signal:
    how much PII a source emits drives keep/drop policy upstream of
    redaction)."""
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def oracle_pii_count(expr: str, name: str) -> str:
    pat = PII_PATTERNS[name][0].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def chunk_tokens(
    df: DataFrame, id_col: str, tokens: Column, size: int, stride: int
) -> DataFrame:
    """GPT-style sliding-window chunking: split each document's token
    array into windows of ``size`` tokens starting every ``stride``
    tokens (overlap = size - stride). Returns (id, chunk_id, chunk)
    with chunk_id dense from 0 in document order.

    Scale shape: sequence()+explode is a row-local generator — no
    shuffle, no state; the token array never leaves the row, and the
    last partial window is kept (truncation is the packer's decision,
    not the chunker's)."""
    base = df.select(F.col(id_col), tokens.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    start = F.explode(
        F.sequence(F.lit(1), F.size("__toks"), F.lit(stride))
    ).alias("__start")
    exploded = base.select(id_col, "__toks", start)
    return exploded.select(
        F.col(id_col),
        ((F.col("__start") - 1) / stride).cast("int").alias("chunk_id"),
        F.slice("__toks", F.col("__start"), size).alias("chunk"),
    )


def bm25_top_terms(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    *,
    min_len: int = 4,
    top_per_doc: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> "DataFrame":
    """BM25 keyword extraction, oracle-exact form: per-document top
    terms by a BM25 score whose idf is the RATIONAL Robertson form
    (N - df + 0.5)/(df + 0.5) instead of its log — every op in the
    score is an exactly-rounded IEEE +,*,/ over identical operands,
    so the doubles (and the ranking) hash-match DuckDB where a libm
    log would drift in the last ulp.

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale shape: explode → (doc,term) and (doc) hash-groupBys (both
    map-side partial) → df groupBy on term → term-key join + doc-key
    join; N and avgdl are a 1-row aggregate broadcast by the scalar
    cross join; the per-doc top-k is a bounded window. No collects,
    no UDFs.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(normalize_text(F.col(text_col)))).alias("term"),
    ).filter(F.length("term") >= min_len)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    n, d = F.col("n_docs").cast("double"), F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    idf = (n - d + F.lit(0.5)) / (d + F.lit(0.5))
    score = (
        idf
        * (tfd * F.lit(k1 + 1.0))
        / (
            tfd
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
            )
        )
    )
    scored = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", "tf", "df", score.alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_per_doc)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --- URL canonicalization (the CommonCrawl refetch-dedup key) ---------------
# Composes the registered URL scalar family (functions/registry.py) into
# the standard canonical-URL dedup key: significant registrable domain
# (cutToFirstSignificantSubdomain — scheme/www/subdomain/port-blind) +
# the lowercased path with query string, fragment, and trailing slashes
# stripped. Pure regex/split expression tree → whole-stage codegen and
# an exact DuckDB mirror.

_URL_SIG_2LD = "('com','net','org','co','gov','edu','mil','biz')"


def canonical_url(url: Column) -> Column:
    """canonicalUrl: cutToFirstSignificantSubdomain(url) || lower(path)
    with trailing slashes stripped — the URL-dedup grouping key."""
    from nutdb_spark.functions.registry import SCALAR_FNS

    sig = SCALAR_FNS["cutToFirstSignificantSubdomain"](url)
    p = F.lower(F.regexp_replace(SCALAR_FNS["path"](url), r"/+$", ""))
    return F.concat(sig, p)


def oracle_canonical_url(expr: str) -> str:
    """DuckDB mirror of canonical_url over a URL expression.

    Mirrors the registry's domain/path regexes and the short embedded
    public-suffix subset verbatim. DuckDB regexp_replace is
    first-match-only — fine here: '^www\\.' and '/+$' each match at
    most once."""
    dom = (
        "regexp_replace(regexp_extract(" + expr + ", "
        "'^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)', 1), "
        "'^www\\.', '')"
    )
    path = (
        "lower(regexp_replace(regexp_extract(" + expr + ", "
        "'^(?:(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*)?([^?#]*)', 1), "
        "'/+$', ''))"
    )
    ls = f"string_split({dom}, '.')"
    n = f"len({ls})"
    sig = (
        f"CASE WHEN {n} >= 3 THEN "
        f"  CASE WHEN {ls}[{n}-1] IN {_URL_SIG_2LD} "
        f"       THEN array_to_string({ls}[{n}-2:{n}], '.') "
        f"       ELSE array_to_string({ls}[{n}-1:{n}], '.') END "
        f"WHEN {n} = 2 THEN {dom} ELSE '' END"
    )
    return f"({sig} || {path})"


# --- bigram-LM rarity scoring (perplexity-filter shape) ---------------------


def bigram_lm_scores(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    *,
    rare_threshold: int = 2,
) -> "DataFrame":
    """Count-based bigram language-model quality signals — the
    CCNet-style perplexity-filter shape, kept EXACT so it oracles.

    "Train" = bigram occurrence counts over the corpus itself (one
    hash-groupBy, map-side partial). "Score" = per document, over its
    bigram occurrences joined to those counts: n_bigrams, rare_cnt
    (occurrences whose corpus count ≤ rare_threshold), rare_rate and
    avg_bg_cnt (each ONE double division over exact int64 sums — a
    float log-perplexity would be libm and never hash-oracle; a high
    rare-bigram rate is the same filter signal, monotone in the
    add-one-smoothed perplexity for fixed doc length). Documents with
    fewer than 2 tokens keep n_bigrams = 0 and NULL rates
    (NULL-instead-of-junk).

    Scale shape: explode → groupBy(bigram) for counts; occurrences
    join counts on the bigram key (shuffle equi-join — the count side
    is corpus-vocabulary-sized, NOT broadcastable at 100 TB, and both
    sides arrive hash-partitioned on the key); then one groupBy(doc).
    No collects, no UDFs, entirely whole-stage codegen.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(normalize_text(F.col(text_col))).alias("w"),
    )
    occ = base.select(
        "doc_id", F.explode(ngrams(F.col("w"), 2)).alias("bg")
    )
    cnt = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    per = (
        occ.join(cnt, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("c") <= rare_threshold, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("rare_cnt"),
            F.sum("c").alias("sum_c"),
        )
    )
    return (
        base.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("rare_cnt"), F.lit(0)).cast("long").alias(
                "rare_cnt"
            ),
            F.try_divide(
                F.col("rare_cnt").cast("double"),
                F.col("n_bigrams").cast("double"),
            ).alias("rare_rate"),
            F.try_divide(
                F.col("sum_c").cast("double"),
                F.col("n_bigrams").cast("double"),
            ).alias("avg_bg_cnt"),
        )
    )


# --- readability / lexical-diversity scoring -------------------------------


def readability_metrics(text: Column) -> dict[str, Column]:
    """Flesch-style readability + lexical diversity, exact enough to
    hash-oracle: sentences = [.!?]+ runs, words = whitespace tokens,
    syllables = vowel-group runs per word (the standard heuristic —
    a real syllabifier is dictionary-bound; the FILTER SIGNAL is the
    same), type-token ratio = distinct lowercased words / words.
    Counts are exact ints; flesch is ONE fixed double expression
    (206.835 − 1.015·W/S − 84.6·Syl/W) mirrored verbatim by the
    oracle. Empty docs → NULL scores (try_divide)."""
    toks = tokenize(normalize_text(text))
    words = F.filter(toks, lambda t: F.length(t) > 0)
    n_words = F.size(words).cast("long")
    sentences = F.size(
        F.filter(
            F.split(text, r"[.!?]+"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    ).cast("long")
    syllables = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(
                F.filter(
                    F.split(F.lower(w), r"[^aeiouy]+"),
                    lambda g: F.length(g) > 0,
                )
            ).cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    distinct_words = F.size(F.array_distinct(words)).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * F.try_divide(n_words.cast("double"), sentences.cast("double"))
        - F.lit(84.6)
        * F.try_divide(syllables.cast("double"), n_words.cast("double"))
    )
    return {
        "n_words": n_words,
        "n_sentences": sentences,
        "n_syllables": syllables,
        "flesch": flesch,
        "ttr": F.try_divide(
            distinct_words.cast("double"), n_words.cast("double")
        ),
    }


def oracle_readability(expr: str) -> dict[str, str]:
    norm = oracle_normalize(expr)
    words = (
        f"list_filter(string_split_regex(trim({norm}), '\\s+'), "
        "t -> length(t) > 0)"
    )
    n_words = f"CAST(len({words}) AS BIGINT)"
    sentences = (
        f"CAST(len(list_filter(string_split_regex({expr}, '[.!?]+'), "
        "s -> length(trim(s)) > 0)) AS BIGINT)"
    )
    syl = (
        f"CAST(list_sum(list_transform({words}, w -> greatest(CAST(len("
        "list_filter(string_split_regex(lower(w), '[^aeiouy]+'), "
        "g -> length(g) > 0)) AS BIGINT), 1))) AS BIGINT)"
    )
    distinct_words = f"CAST(len(list_distinct({words})) AS BIGINT)"
    flesch = (
        f"(206.835 - 1.015 * (CAST({n_words} AS DOUBLE) "
        f"/ CAST({sentences} AS DOUBLE)) "
        f"- 84.6 * (CAST({syl} AS DOUBLE) / CAST({n_words} AS DOUBLE)))"
    )
    return {
        "n_words": n_words,
        "n_sentences": sentences,
        "n_syllables": f"coalesce({syl}, 0)",
        "flesch": (
            f"CASE WHEN {sentences} = 0 OR {n_words} = 0 THEN NULL "
            f"ELSE {flesch} END"
        ),
        "ttr": (
            f"CASE WHEN {n_words} = 0 THEN NULL ELSE "
            f"CAST({distinct_words} AS DOUBLE) "
            f"/ CAST({n_words} AS DOUBLE) END"
        ),
    }


# --- [EXT] fill-in-the-middle transform --------------------------------------

FIM_PRE = "<PRE>"
FIM_SUF = "<SUF>"
FIM_MID = "<MID>"


def fim_transform(
    key: Column,
    text: Column,
    *,
    rate_ppm: int = 500_000,
    salt: str = "fim",
) -> dict[str, Column]:
    """[EXT] Fill-in-the-middle training transform (the code-model
    data-prep step, e.g. Bavarian et al. 2022): a deterministic
    ``rate_ppm``/1e6 fraction of documents is rewritten PSM-style as
    ``<PRE> prefix <SUF> suffix <MID> middle`` so the model learns to
    infill; the rest pass through unchanged. Split points are two
    independent salted md5 draws over [0, len] ordered by value —
    append-stable, engine-portable (the sampling-family convention),
    and a pure projection: no shuffle, no UDF, scales as the scan.

    Returns columns: ``fim_applied`` (bool), ``out_text`` (string),
    ``p1``/``p2`` (the chosen split, 0 when not applied)."""
    from nutdb_spark.operators.sampling import hash_bucket

    n = F.length(text)
    applied = hash_bucket(key, salt) < F.lit(rate_ppm)
    h1 = hash_bucket(key, salt + "1") % (n + 1)
    h2 = hash_bucket(key, salt + "2") % (n + 1)
    p1 = F.least(h1, h2)
    p2 = F.greatest(h1, h2)
    rewritten = F.concat(
        F.lit(FIM_PRE),
        text.substr(F.lit(1), p1.cast("int")),
        F.lit(FIM_SUF),
        text.substr((p2 + 1).cast("int"), n.cast("int")),
        F.lit(FIM_MID),
        text.substr((p1 + 1).cast("int"), (p2 - p1).cast("int")),
    )
    return {
        "fim_applied": applied,
        "out_text": F.when(applied, rewritten).otherwise(text),
        "p1": F.when(applied, p1).otherwise(F.lit(0)).cast("long"),
        "p2": F.when(applied, p2).otherwise(F.lit(0)).cast("long"),
    }


def oracle_fim(
    key_expr: str,
    text_expr: str,
    *,
    rate_ppm: int = 500_000,
    salt: str = "fim",
) -> dict[str, str]:
    from nutdb_spark.operators.sampling import oracle_hash_bucket

    n = f"length({text_expr})"
    applied = f"({oracle_hash_bucket(key_expr, salt)} < {rate_ppm})"
    h1 = f"({oracle_hash_bucket(key_expr, salt + '1')} % ({n} + 1))"
    h2 = f"({oracle_hash_bucket(key_expr, salt + '2')} % ({n} + 1))"
    p1 = f"LEAST({h1}, {h2})"
    p2 = f"GREATEST({h1}, {h2})"
    rewritten = (
        f"'{FIM_PRE}' || substring({text_expr}, 1, CAST({p1} AS INT)) || "
        f"'{FIM_SUF}' || substring({text_expr}, CAST({p2} AS INT) + 1) || "
        f"'{FIM_MID}' || substring({text_expr}, CAST({p1} AS INT) + 1, "
        f"CAST({p2} - {p1} AS INT))"
    )
    return {
        "fim_applied": applied,
        "out_text": f"CASE WHEN {applied} THEN {rewritten} "
        f"ELSE {text_expr} END",
        "p1": f"CAST(CASE WHEN {applied} THEN {p1} ELSE 0 END AS BIGINT)",
        "p2": f"CAST(CASE WHEN {applied} THEN {p2} ELSE 0 END AS BIGINT)",
    }


# --- [EXT] Gopher quality rules ----------------------------------------------

# The published rule-set constants (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A —
# the MassiveWeb quality filter). Kept verbatim; the rule *decisions*
# below are exact-integer cross-multiplications so the pass/fail bits
# hash-oracle (no float ratio ever feeds a comparison).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_rules(
    text: Column,
    *,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = GOPHER_MIN_STOPWORD_HITS,
) -> dict[str, Column]:
    """[EXT] The Gopher/MassiveWeb document-quality rule set as exact
    counters + per-rule booleans + the composite gate:

    - ``ok_words``: 50 ≤ word count ≤ 100 000,
    - ``ok_mean_len``: mean word length in [3, 10] — decided as
      ``3·n_words ≤ Σlen ≤ 10·n_words`` (integer, no division),
    - ``ok_symbol``: symbol-to-word ratio ≤ 0.1 for EACH of ``#``
      and ``...`` separately (``10·n_hash ≤ n_words`` AND
      ``10·n_ellipsis ≤ n_words`` — the paper applies the 0.1
      threshold per symbol, not to the combined count; the
      ``n_symbols`` output column stays the combined counter),
    - ``ok_bullet``: ≤ 90% of non-empty lines start with a bullet
      (``10·n_bullet ≤ 9·n_lines`` — Rae et al. 2021 App. A rejects
      only bullet-DOMINATED documents),
    - ``ok_ellipsis``: ≤ 30% of non-empty lines end with ``...``,
    - ``ok_alpha``: ≥ 80% of words contain an alphabetic character
      (``5·n_alpha_words ≥ 4·n_words``),
    - ``ok_stop``: ≥ ``min_stop_hits`` distinct hits from the stop
      list (the published rule says "stop words appropriate to the
      corpus"; the published English 8-word list is the default and
      both knobs are parameters because the list is the one
      corpus-dependent constant in the set),
    - ``passes`` = AND of all seven.

    One projection over the scan — no shuffle, no UDF; at 100 TB this
    is the map-side gate in front of every downstream stage, which is
    why every rule is a codegen'd expression.

    The dict values are all field reads of ONE let-bound struct
    (``gopher_struct``): selecting a single field (the common
    ``["passes"]`` gate) evaluates the tokenization exactly once.
    Callers that project MANY fields should bind the struct to a
    column first (``q_text_gopher``) — each dict value carries its
    own copy of the struct tree."""
    st = gopher_struct(
        text, stopwords=stopwords, min_stop_hits=min_stop_hits
    )
    return {name: st[name] for name in GOPHER_FIELDS}


GOPHER_FIELDS: tuple[str, ...] = (
    "n_words",
    "sum_word_len",
    "n_symbols",
    "n_lines",
    "n_bullet_lines",
    "n_ellipsis_lines",
    "n_alpha_words",
    "n_stop_hits",
    "ok_words",
    "ok_mean_len",
    "ok_symbol",
    "ok_bullet",
    "ok_ellipsis",
    "ok_alpha",
    "ok_stop",
    "passes",
)


def gopher_struct(
    text: Column,
    *,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = GOPHER_MIN_STOPWORD_HITS,
) -> Column:
    """All of ``gopher_rules``'s counters + rule booleans + gate as
    ONE struct column, with the word/line arrays LET-BOUND through a
    1-element-array transform (the rankCorr binder idiom): the
    original flat expressions referenced the tokenize subtree ~6× —
    HOF subtrees are CodegenFallback and get no CSE, so every
    reference re-split the document. Now each array and each counter
    is evaluated once per row; the counters are bound by a second
    nested transform so the rule comparisons read struct fields.
    Identical arithmetic in identical order ⇒ bit-identical."""
    words = F.filter(tokenize(text), lambda t: F.length(t) > 0)
    lines = F.filter(
        F.split(text, r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    # regexp_count scalars are cheap leaf expressions — no binding
    n_hash_syms = F.regexp_count(text, F.lit(r"#")).cast("long")
    n_ellipsis_syms = F.regexp_count(text, F.lit(r"\.\.\.")).cast("long")

    def counters(b):
        w, l = b["w"], b["l"]
        lowered = F.transform(w, F.lower)
        return F.struct(
            F.size(w).cast("long").alias("n_words"),
            F.aggregate(
                w, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            ).alias("sum_len"),
            n_hash_syms.alias("n_hash"),
            n_ellipsis_syms.alias("n_ell_syms"),
            F.size(l).cast("long").alias("n_lines"),
            F.size(F.filter(l, lambda x: x.rlike(r"^\s*[-*]")))
            .cast("long")
            .alias("n_bullet"),
            F.size(F.filter(l, lambda x: x.rlike(r"\.\.\.\s*$")))
            .cast("long")
            .alias("n_ellipsis"),
            F.size(F.filter(w, lambda t: t.rlike(r"[A-Za-z]")))
            .cast("long")
            .alias("n_alpha"),
            F.size(
                F.filter(
                    F.array(*[F.lit(s) for s in stopwords]),
                    lambda s: F.array_contains(lowered, s),
                )
            )
            .cast("long")
            .alias("n_stop"),
        )

    def finish(c):
        n_words = c["n_words"]
        ok_words = (n_words >= GOPHER_MIN_WORDS) & (
            n_words <= GOPHER_MAX_WORDS
        )
        ok_mean_len = (
            c["sum_len"] >= F.lit(GOPHER_MIN_MEAN_WORD_LEN) * n_words
        ) & (c["sum_len"] <= F.lit(GOPHER_MAX_MEAN_WORD_LEN) * n_words)
        ok_symbol = (F.lit(10) * c["n_hash"] <= n_words) & (
            F.lit(10) * c["n_ell_syms"] <= n_words
        )
        ok_bullet = F.lit(10) * c["n_bullet"] <= F.lit(9) * c["n_lines"]
        ok_ellipsis = (
            F.lit(10) * c["n_ellipsis"] <= F.lit(3) * c["n_lines"]
        )
        ok_alpha = F.lit(5) * c["n_alpha"] >= F.lit(4) * n_words
        ok_stop = c["n_stop"] >= min_stop_hits
        return F.struct(
            n_words.alias("n_words"),
            c["sum_len"].alias("sum_word_len"),
            (c["n_hash"] + c["n_ell_syms"]).alias("n_symbols"),
            c["n_lines"].alias("n_lines"),
            c["n_bullet"].alias("n_bullet_lines"),
            c["n_ellipsis"].alias("n_ellipsis_lines"),
            c["n_alpha"].alias("n_alpha_words"),
            c["n_stop"].alias("n_stop_hits"),
            ok_words.alias("ok_words"),
            ok_mean_len.alias("ok_mean_len"),
            ok_symbol.alias("ok_symbol"),
            ok_bullet.alias("ok_bullet"),
            ok_ellipsis.alias("ok_ellipsis"),
            ok_alpha.alias("ok_alpha"),
            ok_stop.alias("ok_stop"),
            (
                ok_words
                & ok_mean_len
                & ok_symbol
                & ok_bullet
                & ok_ellipsis
                & ok_alpha
                & ok_stop
            ).alias("passes"),
        )

    return F.transform(
        F.array(F.struct(words.alias("w"), lines.alias("l"))),
        lambda b: F.transform(F.array(counters(b)), finish)[0],
    )[0]


def oracle_gopher(
    expr: str,
    *,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = GOPHER_MIN_STOPWORD_HITS,
) -> dict[str, str]:
    words = (
        f"list_filter(string_split_regex(trim({expr}), '\\s+'), "
        "t -> length(t) > 0)"
    )
    n_words = f"CAST(len({words}) AS BIGINT)"
    sum_len = (
        f"CAST(coalesce(list_sum(list_transform({words}, "
        "t -> CAST(length(t) AS BIGINT))), 0) AS BIGINT)"
    )
    n_hash_syms = f"CAST(len(regexp_extract_all({expr}, '#')) AS BIGINT)"
    n_ellipsis_syms = (
        f"CAST(len(regexp_extract_all({expr}, '\\.\\.\\.')) AS BIGINT)"
    )
    n_symbols = f"({n_hash_syms} + {n_ellipsis_syms})"
    lines = (
        f"list_filter(string_split({expr}, chr(10)), "
        "l -> length(trim(l)) > 0)"
    )
    n_lines = f"CAST(len({lines}) AS BIGINT)"
    n_bullet = (
        f"CAST(len(list_filter({lines}, "
        "l -> regexp_matches(l, '^\\s*[-*]'))) AS BIGINT)"
    )
    n_ellipsis = (
        f"CAST(len(list_filter({lines}, "
        "l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS BIGINT)"
    )
    n_alpha = (
        f"CAST(len(list_filter({words}, "
        "t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)"
    )
    stop_lst = ", ".join(f"'{s}'" for s in stopwords)
    lowered = f"list_transform({words}, t -> lower(t))"
    n_stop = (
        f"CAST(len(list_filter([{stop_lst}], "
        f"s -> list_contains({lowered}, s))) AS BIGINT)"
    )
    ok_words = (
        f"({n_words} >= {GOPHER_MIN_WORDS} "
        f"AND {n_words} <= {GOPHER_MAX_WORDS})"
    )
    ok_mean_len = (
        f"({sum_len} >= {GOPHER_MIN_MEAN_WORD_LEN} * {n_words} "
        f"AND {sum_len} <= {GOPHER_MAX_MEAN_WORD_LEN} * {n_words})"
    )
    ok_symbol = (
        f"(10 * {n_hash_syms} <= {n_words} "
        f"AND 10 * {n_ellipsis_syms} <= {n_words})"
    )
    ok_bullet = f"(10 * {n_bullet} <= 9 * {n_lines})"
    ok_ellipsis = f"(10 * {n_ellipsis} <= 3 * {n_lines})"
    ok_alpha = f"(5 * {n_alpha} >= 4 * {n_words})"
    ok_stop = f"({n_stop} >= {min_stop_hits})"
    return {
        "n_words": n_words,
        "sum_word_len": sum_len,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ellipsis,
        "n_alpha_words": n_alpha,
        "n_stop_hits": n_stop,
        "ok_words": ok_words,
        "ok_mean_len": ok_mean_len,
        "ok_symbol": ok_symbol,
        "ok_bullet": ok_bullet,
        "ok_ellipsis": ok_ellipsis,
        "ok_alpha": ok_alpha,
        "ok_stop": ok_stop,
        "passes": (
            f"({ok_words} AND {ok_mean_len} AND {ok_symbol} AND "
            f"{ok_bullet} AND {ok_ellipsis} AND {ok_alpha} AND {ok_stop})"
        ),
    }


# --- [EXT] lexicon sentiment scoring -----------------------------------------

# AFINN-style integer valence lexicon over the fixture vocabulary
# (the published lexicons are word→[-5, 5] integer maps; this one is
# committed, engine-portable, and covers the corpus so the score
# carries signal). Unknown words are neutral.
SENTIMENT_LEXICON: tuple[tuple[str, int], ...] = (
    ("fast", 2),
    ("big", 1),
    ("merge", 1),
    ("value", 1),
    ("slow", -2),
    ("small", -1),
    ("dup", -2),
    ("error", -3),
)


def sentiment_scores(text: Column) -> dict[str, Column]:
    """[EXT] Lexicon-based sentiment (the classic Spark-at-scale text
    analytics job, e.g. the large-scale Twitter sentiment line of
    work): per document, the exact integer sum of per-token valences
    from the committed lexicon, the matched-token count, and the
    sign label (pos/neg/neu with the ≥/≤ 0 boundary at neu). One
    codegen'd projection — a map-side gate/feature at any corpus
    size; no float anywhere, so it hash-oracles."""
    toks = F.filter(
        tokenize(normalize_text(text)), lambda t: F.length(t) > 0
    )

    def hits(word: str) -> Column:
        # a dedicated closure: a `lambda t, w=w:` default would make
        # pyspark read the lambda as the two-arg (element, index) form
        return F.size(F.filter(toks, lambda t: t == F.lit(word))).cast(
            "long"
        )

    val = None
    for w, v in SENTIMENT_LEXICON:
        term = hits(w) * F.lit(v)
        val = term if val is None else val + term
    n_hits = None
    for w, _ in SENTIMENT_LEXICON:
        h = hits(w)
        n_hits = h if n_hits is None else n_hits + h
    label = (
        F.when(val > 0, F.lit("pos"))
        .when(val < 0, F.lit("neg"))
        .otherwise(F.lit("neu"))
    )
    return {
        "sentiment": val,
        "n_hits": n_hits,
        "label": label,
    }


def oracle_sentiment(expr: str) -> dict[str, str]:
    words = (
        f"list_filter({oracle_tokenize(oracle_normalize(expr))}, "
        "t -> length(t) > 0)"
    )
    val = " + ".join(
        f"CAST(len(list_filter({words}, t -> t = '{w}')) AS BIGINT) * ({v})"
        for w, v in SENTIMENT_LEXICON
    )
    hits = " + ".join(
        f"CAST(len(list_filter({words}, t -> t = '{w}')) AS BIGINT)"
        for w, _ in SENTIMENT_LEXICON
    )
    return {
        "sentiment": f"({val})",
        "n_hits": f"({hits})",
        "label": (
            f"CASE WHEN ({val}) > 0 THEN 'pos' "
            f"WHEN ({val}) < 0 THEN 'neg' ELSE 'neu' END"
        ),
    }


# --- [EXT] round-13: deterministic span corruption (T5 denoising) ------------
#
# The T5 pretraining objective (Raffel et al. 2020): drop ~15% of the
# tokens in short contiguous spans, replace each span with a sentinel
# in the input, and emit "<sentinel> dropped tokens ..." as the
# target. The published recipe samples spans randomly; an engine
# transform must be REPRODUCIBLE across engines, re-runs and appends,
# so this variant derives the span layout deterministically per
# document: a salted hash of the doc id picks a phase offset, and a
# length-`span` masked window recurs every `stride` positions from
# that offset (span/stride = 3/20 -> the canonical 15% corruption
# rate, mean span 3). Same document -> same corruption, any engine.

SPANC_STRIDE = 20
SPANC_SPAN = 3


def span_corrupt_cols(
    words: Column,
    doc_key: Column,
    *,
    stride: int = SPANC_STRIDE,
    span: int = SPANC_SPAN,
    salt: str = "spanc",
) -> dict[str, Column]:
    """(n_tokens, n_masked, input_text, target_text) over a word
    array. Pure row-local array expressions — no shuffle, no UDF.

    HOF discipline (the operators/dedup.py cliff): the hash-derived
    phase must NOT appear inside element lambdas — a captured
    expression re-evaluates per ELEMENT, so the md5 phase would be
    recomputed for every word in every output column (measured 5x on
    the composed pipeline). Instead the span layout is built ONCE per
    row as a mask array — ``array_repeat``/``sequence`` arguments are
    row-level — encoding keep as −1, span-interior as −2, and a span
    START as its sentinel index k; the lambdas then only read the
    mask element."""
    from nutdb_spark.operators.sampling import hash_bucket

    n = F.size(words)
    off = hash_bucket(doc_key, salt=salt, grain=stride).cast("int")
    # blocks of `stride` slots: [k, -2 x (span-1), -1 x (stride-span)]
    nblk = F.greatest(
        F.ceil((n.cast("double") - off) / stride).cast("int"), F.lit(0)
    )
    blocks = F.transform(
        F.sequence(F.lit(0), nblk),
        lambda b: F.concat(
            F.array(b),
            F.array_repeat(F.lit(-2), span - 1),
            F.array_repeat(F.lit(-1), stride - span),
        ),
    )
    mask = F.slice(
        F.concat(F.array_repeat(F.lit(-1), off), F.flatten(blocks)),
        1,
        F.greatest(n, F.lit(0)),
    )
    sentinel = lambda m: F.concat(  # noqa: E731
        F.lit("<extra_id_"), m.cast("string"), F.lit(">")
    )
    inp = F.array_join(
        F.filter(
            F.zip_with(
                words,
                mask,
                lambda w, m: F.when(m >= 0, sentinel(m))
                .when(m == -2, F.lit(""))
                .otherwise(w),
            ),
            lambda x: x != "",
        ),
        " ",
    )
    tgt = F.array_join(
        F.filter(
            F.zip_with(
                words,
                mask,
                lambda w, m: F.when(
                    m >= 0, F.concat(sentinel(m), F.lit(" "), w)
                )
                .when(m == -2, w)
                .otherwise(F.lit("")),
            ),
            lambda x: x != "",
        ),
        " ",
    )
    n_masked = F.size(F.filter(mask, lambda m: m != -1)).cast("long")
    return {
        "n_tokens": F.size(words).cast("long"),
        "n_masked": n_masked,
        "input_text": inp,
        "target_text": tgt,
    }


def oracle_span_corrupt(
    words_expr: str,
    key_expr: str,
    *,
    stride: int = SPANC_STRIDE,
    span: int = SPANC_SPAN,
    salt: str = "spanc",
) -> dict[str, str]:
    """DuckDB twin of ``span_corrupt_cols`` (1-based list indexing)."""
    from nutdb_spark.operators.sampling import oracle_hash_bucket

    off = oracle_hash_bucket(key_expr, salt=salt, grain=stride)
    p = "(i - 1)"
    rel = f"({p} - ({off}))"
    started = f"({p} >= ({off}) AND ({rel}) % {stride} = 0)"
    inside = (
        f"({p} >= ({off}) AND ({rel}) % {stride} > 0 "
        f"AND ({rel}) % {stride} < {span})"
    )
    k = f"(({rel}) // {stride})"
    sentinel = f"('<extra_id_' || CAST({k} AS VARCHAR) || '>')"
    w = f"{words_expr}[i]"
    rng = f"range(1, len({words_expr}) + 1)"
    # COALESCE: DuckDB's array_to_string over an empty list is NULL,
    # Spark's array_join is ''
    inp = f"""COALESCE(array_to_string(list_filter(list_transform({rng},
      i -> CASE WHEN {started} THEN {sentinel}
                WHEN {inside} THEN ''
                ELSE {w} END), x -> x != ''), ' '), '')"""
    tgt = f"""COALESCE(array_to_string(list_filter(list_transform({rng},
      i -> CASE WHEN {started} THEN {sentinel} || ' ' || {w}
                WHEN {inside} THEN {w}
                ELSE '' END), x -> x != ''), ' '), '')"""
    n_masked = f"""CAST(len(list_filter({rng},
      i -> {started} OR {inside})) AS BIGINT)"""
    return {
        "n_tokens": f"CAST(len({words_expr}) AS BIGINT)",
        "n_masked": n_masked,
        "input_text": inp,
        "target_text": tgt,
    }
