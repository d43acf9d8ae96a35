"""[EXT] Text-analysis suite over the `documents` fixture.

Each entry exercises one operators.text lowering with an exact DuckDB
oracle built from the matching oracle_* helper — the helpers guarantee
the two engines compute literally the same integer/md5/regex pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.text import (
    bpe_ish_tokens,
    oracle_readability,
    fingerprint_md5,
    lang_id,
    ngrams,
    normalize_text,
    oracle_bpe_ish,
    oracle_fingerprint_md5,
    oracle_lang_id,
    oracle_ngrams,
    oracle_normalize,
    oracle_pii_count,
    oracle_redact_pii,
    oracle_rolling_hash,
    oracle_simhash16,
    oracle_simhash_bits,
    oracle_token_hashes_md5,
    oracle_tokenize,
    quality_metrics,
    rolling_hash,
    simhash16,
    tokenize,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_WORDS = oracle_tokenize("text")


@query(
    "q_text_normalize",
    f"""
    SELECT doc_id,
           {oracle_normalize('text')} AS norm,
           {oracle_fingerprint_md5('text')} AS fp_md5
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalizeText + md5 content fingerprint (dedup key)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm"),
        fingerprint_md5(F.col("text")).alias("fp_md5"),
    )


@query(
    "q_text_tokenize",
    f"""
    SELECT doc_id,
           len({_WORDS}) AS n_tokens,
           len({oracle_bpe_ish('text')}) AS n_bpe,
           {_WORDS}[1] AS first_token
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + BPE-ish regex token counting."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(bpe_ish_tokens(F.col("text"))).alias("n_bpe"),
        F.element_at(toks, 1).alias("first_token"),
    )


@query(
    "q_text_ngrams",
    f"""
    SELECT doc_id,
           len(list_distinct({oracle_ngrams(_WORDS, 2)})) AS n_bigrams,
           len(list_distinct({oracle_ngrams(_WORDS, 3)})) AS n_trigrams,
           list_aggregate({oracle_ngrams(_WORDS, 3)}, 'min') AS min_trigram
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(ngrams(toks, 2))).alias("n_bigrams"),
        F.size(F.array_distinct(ngrams(toks, 3))).alias("n_trigrams"),
        F.array_min(ngrams(toks, 3)).alias("min_trigram"),
    )


@query(
    "q_text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len({_WORDS}) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform({_WORDS}, t -> CAST(length(t) AS BIGINT)))
                AS BIGINT) / greatest(len({_WORDS}), 1) AS mean_token_len,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
             / greatest(length(text), 1) AS punct_ratio,
           len(list_filter({_WORDS}, t -> list_contains(
               ['the','a','and','of','to','in','is','for','that','it','on','with','as'],
               lower(t)))) * 1.0 / greatest(len({_WORDS}), 1) AS stopword_ratio
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring feature set (length / punct / stopword ratios)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    m = quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["mean_token_len"].alias("mean_token_len"),
        m["punct_ratio"].alias("punct_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
    )


@query(
    "q_text_langid",
    f"""
    SELECT doc_id, lang AS labeled, {oracle_lang_id(_WORDS)} AS guessed
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (deterministic heuristic) alongside
    the fixture label."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled"),
        lang_id(F.col("text")).alias("guessed"),
    )


@query(
    "q_text_fingerprint",
    f"""
    SELECT doc_id,
           {oracle_rolling_hash(oracle_normalize('text'))} AS rhash,
           {oracle_simhash_bits(oracle_token_hashes_md5(_WORDS), 16)} AS simhash
    FROM documents WHERE doc_id < 100
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash of the normalized text (dialect-parity
    column, exact integer Horner pipeline) + 16-bit SimHash over md5
    token hashes. The SimHash side uses the row-relational `simhash_df`
    (one codegen'd md5 per token, then per-bit aggregates) rather than
    the array-expression `simhash16`, which re-evaluates the token-hash
    array inside each of its 16 per-bit lambdas (measured ~6× slower);
    the md5 token hash is ~2× faster again than the interpreted
    rolling-hash HOF and is the operator default."""
    from nutdb_spark.operators.dedup import simhash_df

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fp = simhash_df(d, "doc_id", "text", bits=16).select(
        F.col("__id").alias("doc_id"), F.col("__fp").alias("simhash")
    )
    return d.select(
        "doc_id",
        rolling_hash(normalize_text(F.col("text"))).alias("rhash"),
    ).join(fp, "doc_id")


# --- deterministic sampling & splits (operators/sampling.py) --------------


from nutdb_spark.operators.dedup import (  # noqa: E402
    oracle_shingles as _oracle_shingles,
)
from nutdb_spark.operators.sampling import (  # noqa: E402
    oracle_hash_bucket,
    oracle_kfold,
    oracle_quota,
    oracle_split_case,
    oracle_stratified_threshold,
    sample_fraction,
    with_split,
)


@query(
    "q_sample_hash",
    f"""
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    WHERE {oracle_hash_bucket('doc_id', salt='s1')} < 100000
    GROUP BY lang
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample: kept iff md5('s1'||doc_id) bucket
    < 0.1·grain — append-stable and engine-portable, unlike df.sample
    whose output depends on partition layout. A pure projection filter:
    no shuffle, scales like the scan."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    return (
        sample_fraction(d, F.col("doc_id"), 0.1, salt="s1")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "q_split_train_eval",
    f"""
    SELECT {oracle_split_case('doc_id', _SPLITS)} AS split,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY split
    """,
)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by hash range: a row's
    split is a pure function of its id, so late-arriving rows land
    where they always would have and no engine/partitioning change can
    move a document across the contamination boundary."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    return (
        with_split(d, F.col("doc_id"), fractions=_SPLITS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


@query(
    "q_text_termstats",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term
      FROM (SELECT doc_id, {oracle_normalize('text')} AS norm
            FROM documents WHERE doc_id < 300)),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM toks WHERE len(term) >= 4 GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    r AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, tf.term) AS rank
          FROM tf JOIN dfreq USING (term))
    SELECT doc_id, term, tf, df, rank FROM r WHERE rank <= 3
    """,
)
def q_text_termstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term statistics (exact-integer form): per-document top-3
    terms by frequency with corpus document frequency riding along —
    the keyword-extraction / idf building block. The ln(N/df) float is
    deliberately left to the consumer (libm last-ulp differences would
    break the bit-exact oracle); (tf, df, N) is the lossless integer
    core. All JVM built-ins: explode → two map-side-partial groupBys →
    term-key join → bounded per-doc window."""
    from nutdb_spark.operators.text import term_stats

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return term_stats(d, "doc_id", "text", min_len=4, top_per_doc=3)


_STRATA = {"en": 0.1, "zh": 0.8, "fr": 1.0}  # rebalance: downsample en


@query(
    "q_sample_stratified",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {oracle_hash_bucket('doc_id', salt='s2')} <
          {oracle_stratified_threshold('lang', _STRATA, default=0.25)}
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling — class rebalancing: keep
    10% of the dominant language, 80% of zh, all of fr, 25% of
    everything else. Row-level output (doc_id, lang) so the driver
    verifies the exact membership, not just counts. Same pure-
    projection hash-threshold as q_sample_hash: the threshold is
    selected per row by the stratum value, still no shuffle."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.sampling import sample_stratified

    d = load_table(spark, sf_dir, "documents")
    return sample_stratified(
        d, F.col("doc_id"), F.col("lang"), _STRATA,
        default=0.25, salt="s2",
    ).select("doc_id", "lang")


@query(
    "q_text_repetition",
    f"""
    WITH toks AS (
      SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 300),
    ex AS (SELECT doc_id, unnest(w) AS t FROM toks),
    gram2 AS (
      SELECT doc_id, t || ' ' || lead(t) OVER (
               PARTITION BY doc_id ORDER BY rn) AS g
      FROM (SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id) AS rn
            FROM ex) s),
    rep AS (SELECT doc_id, MAX(c) AS max_bigram FROM (
              SELECT doc_id, g, COUNT(*) AS c FROM gram2
              WHERE g IS NOT NULL GROUP BY doc_id, g) t GROUP BY doc_id)
    SELECT s.doc_id,
           len(s.w) AS n_tokens,
           len(list_distinct(s.w)) AS n_distinct,
           1.0 - CAST(len(list_distinct(s.w)) AS DOUBLE)
               / CAST(len(s.w) AS DOUBLE) AS dup_ratio,
           COALESCE(r.max_bigram, 0) AS max_bigram
    FROM toks s LEFT JOIN rep r ON s.doc_id = r.doc_id
    WHERE len(s.w) > 0
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the compression-proxy family):
    per doc the distinct-token ratio and the max bigram multiplicity —
    high dup_ratio / max_bigram flags boilerplate and degenerate
    repetition, a standard pretraining-corpus filter. Exact ints + one
    IEEE double division; bigrams via the shifted-zip ngrams helper
    (per-row evaluation, no per-element re-evaluation)."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = tokenize(F.col("text"))
    base = d.select("doc_id", toks.alias("w")).filter(F.size("w") > 0)
    # ngrams() needs UNNAMED token expressions (arrays_zip derives its
    # struct field names "0","1" from positional unnamed inputs)
    grams = d.select(
        "doc_id", F.explode(ngrams(tokenize(F.col("text")), 2)).alias("g")
    )
    rep = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram"))
    )
    return (
        base.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.size(F.array_distinct("w")).alias("n_distinct"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("w")).cast("double")
                / F.size("w").cast("double")
            ).alias("dup_ratio"),
            F.coalesce(F.col("max_bigram"), F.lit(0)).cast("long").alias(
                "max_bigram"
            ),
        )
    )


@query(
    "q_sample_domain_cap",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {oracle_hash_bucket('doc_id', salt='cap')}, doc_id
             ) AS rn
      FROM documents) t
    WHERE rn <= 10
    """,
)
def q_sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the domain-balancing crawl filter:
    no single site may dominate the corpus). Keeps ≤10 docs per
    source, selected DETERMINISTICALLY by salted-hash order (not
    arrival order, which would make the kept set depend on scan
    order): one window shuffle on the source key, engine-portable,
    and a late-arriving doc displaces the same victim everywhere."""
    from pyspark.sql import Window

    from nutdb_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash_bucket(F.col("doc_id"), "cap"), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source")
    )


@query(
    "q_text_decontaminate",
    f"""
    WITH sh AS (
      SELECT doc_id, {{SH}} AS sh FROM documents),
    ev AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
    tr AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20)
    SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_shared
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    """.replace("{SH}", _oracle_shingles("text", 4)),
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    a word-4-gram shingle with the held-out eval set (doc_id < 20
    stands in for the benchmark corpus; real pipelines use 8-13-gram
    windows — the gram size is a knob, the plan is identical) and
    report the shared-shingle count — the standard n-gram-overlap
    contamination check. Scale shape: the eval shingle set is small
    and DISTINCT (broadcast-able semi-join side), training shingles
    stream through an equi-join — never an all-pairs comparison;
    flagged ids then drive an anti-join drop."""
    from nutdb_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(shingles(F.col("text"), 4)).alias("s")
    )
    ev = (
        sh.filter(F.col("doc_id") < 20).select("s").distinct()
    )
    tr = sh.filter(F.col("doc_id") >= 20)
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_shared"))
    )


@query(
    "sql_table_fn_decon",
    f"""
    WITH sh AS (
      SELECT doc_id, {{SH}} AS sh FROM documents),
    ev AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
    tr AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20)
    SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_shared
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
    """.replace("{SH}", _oracle_shingles("text", 4)),
)
def sql_table_fn_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] decontamination at the SQL surface:
    decontaminate('train', 'eval', 'doc_id', 'text', 4) runs the
    benchmark n-gram-overlap check as a TABLE FUNCTION (the plan of
    q_text_decontaminate above — broadcast DISTINCT eval shingles,
    training shingles stream through the equi-join, never all-pairs).
    The train/eval corpora are real catalog tables built by CTAS, so a
    dialect user can decontaminate without touching the Python API —
    the one pipeline step round 7 left SQL-unreachable."""
    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark, data_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS decon_eval")
    eng.sql("DROP TABLE IF EXISTS decon_train")
    eng.sql(
        "CREATE TABLE decon_eval AS "
        "SELECT doc_id, text FROM documents WHERE doc_id < 20"
    )
    eng.sql(
        "CREATE TABLE decon_train AS "
        "SELECT doc_id, text FROM documents WHERE doc_id >= 20"
    )
    return eng.sql(
        """
        select doc_id, n_shared
        from decontaminate('decon_train', 'decon_eval',
                           'doc_id', 'text', 4)
        order by doc_id
        """
    )


@query(
    "sql_table_fn_decon_drop",
    f"""
    WITH sh AS (
      SELECT doc_id, {{SH}} AS sh FROM documents),
    ev AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
    tr AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20),
    shared AS (
      SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n
      FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id >= 20
      AND d.doc_id NOT IN (SELECT doc_id FROM shared WHERE n >= 3)
    ORDER BY d.doc_id
    """.replace("{SH}", _oracle_shingles("text", 4)),
)
def sql_table_fn_decon_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the DROP form of the decontaminate table function: a 6th
    literal (min_shared) makes it return the TRAIN TABLE with every
    document sharing >= min_shared distinct eval shingles removed —
    the output a pipeline actually trains on. The flagged-id frame is
    bounded by contamination, not corpus size, so the drop is a
    broadcast LEFT ANTI join and the train scan streams through
    untouched at any scale."""
    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark, data_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS decon_eval2")
    eng.sql("DROP TABLE IF EXISTS decon_train2")
    eng.sql(
        "CREATE TABLE decon_eval2 AS "
        "SELECT doc_id, text FROM documents WHERE doc_id < 20"
    )
    eng.sql(
        "CREATE TABLE decon_train2 AS "
        "SELECT doc_id, text FROM documents WHERE doc_id >= 20"
    )
    return eng.sql(
        """
        select doc_id
        from decontaminate('decon_train2', 'decon_eval2',
                           'doc_id', 'text', 4, 3)
        order by doc_id
        """
    )


from nutdb_spark.operators.packing import PACK_GRAIN as _PACK_GRAIN

_PACK_H = oracle_hash_bucket("doc_id", salt="pack", grain=_PACK_GRAIN)
_PACK_BUDGET = 256
_PACK_SHARDS = 4


@query(
    "q_pack_sequences",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             {_PACK_H} AS __h,
             CAST(({_PACK_H}) % {_PACK_SHARDS} AS INT) AS __shard
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, __shard,
             CAST(SUM(n_tokens) OVER (PARTITION BY __shard
                    ORDER BY __h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
      FROM t
    )
    SELECT doc_id, n_tokens, __shard AS shard,
           (__cum - n_tokens) // {_PACK_BUDGET} AS seq,
           (__cum - n_tokens) % {_PACK_BUDGET} AS "offset",
           CASE WHEN n_tokens > 0
                THEN (__cum - 1) // {_PACK_BUDGET}
                     - (__cum - n_tokens) // {_PACK_BUDGET} + 1
                ELSE 0 END AS n_seqs
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (GPT-style fixed-length training chunks): each
    document's tokens land at a deterministic (shard, seq, offset) in a
    concatenate-and-slice layout with a 256-token budget — documents
    straddle sequence boundaries, nothing padded or dropped. The only
    shuffle is the hash partition on shard; the cumulative sum is a
    per-shard ROWS window, so the plan scales by adding shards (no
    global sort, no driver state)."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.packing import pack_sequences
    from nutdb_spark.operators.text import tokenize

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens")
    )
    return pack_sequences(
        d,
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_PACK_BUDGET,
        shards=_PACK_SHARDS,
    )


_PII_SRC_ORA = (
    "CASE WHEN doc_id % 3 != 0 THEN text || ' reach user' "
    "|| CAST(doc_id AS VARCHAR) || '@mail' || CAST(doc_id % 7 AS VARCHAR) "
    "|| '.org or 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' "
    "|| CAST(doc_id % 100 AS VARCHAR) || ' tel +1 555-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END"
)


@query(
    "q_text_pii",
    f"""
    WITH s AS (SELECT doc_id, {_PII_SRC_ORA} AS t FROM documents)
    SELECT doc_id,
           {oracle_redact_pii('t')} AS redacted,
           {oracle_pii_count('t', 'email')} AS n_email,
           {oracle_pii_count('t', 'phone')} AS n_phone,
           {oracle_pii_count('t', 'ip')} AS n_ip
    FROM s
    """,
)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails / phone numbers / IPv4s replaced with
    typed placeholders plus per-category audit counts. Patterns are
    Java-regex/RE2-identical so both engines see the same matches; the
    fixture has no organic PII, so a deterministic contact string is
    synthesized onto 2/3 of the docs (the other third pins the no-op
    path). All regexp_replace/regexp_count — codegen, no UDF, no
    shuffle."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.text import pii_counts, redact_pii

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    synth = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        did.cast("string"),
        F.lit("@mail"),
        (did % 7).cast("string"),
        F.lit(".org or 10."),
        (did % 250).cast("string"),
        F.lit(".0."),
        (did % 100).cast("string"),
        F.lit(" tel +1 555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    t = F.when(did % 3 != 0, synth).otherwise(F.col("text"))
    counts = pii_counts(t)
    return d.select(
        "doc_id",
        redact_pii(t).alias("redacted"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ip"].alias("n_ip"),
    )


@query(
    "q_text_chunk",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents
               WHERE doc_id < 150),
    s AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 48)) AS start
          FROM t WHERE len(w) > 0)
    SELECT doc_id,
           CAST((start - 1) // 48 AS INT) AS chunk_id,
           CAST(len(list_slice(w, start, LEAST(start + 63, len(w))))
                AS INT) AS n_tok,
           array_to_string(list_slice(w, start, LEAST(start + 63, len(w))),
                           ' ') AS chunk_text
    FROM s
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (context-window prep): 64-token
    chunks every 48 tokens (16-token overlap), last partial chunk kept.
    sequence()+explode is a row-local generator — no shuffle, the token
    array never leaves the row; chunk_id is dense from 0 in document
    order so a packer can join chunks back deterministically. Output
    scalarized (count + joined text) for the driver compare."""
    from nutdb_spark.operators.text import chunk_tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    chunks = chunk_tokens(
        d.select("doc_id", tokenize(F.col("text")).alias("w")),
        "doc_id",
        F.col("w"),
        size=64,
        stride=48,
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").alias("n_tok"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


@query(
    "q_sample_temperature",
    f"""
    WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents
               GROUP BY source),
    m AS (SELECT MIN(cnt) AS cmin FROM c),
    r AS (SELECT source,
                 CAST(FLOOR(1000000 * SQRT(CAST(cmin AS DOUBLE)
                                           / CAST(cnt AS DOUBLE)))
                      AS BIGINT) AS thr
          FROM c, m)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE {oracle_hash_bucket('d.doc_id', salt='temp')} < r.thr
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (α = 0.5, the UL2/PaLM
    mixing idiom): per-source keep rate sqrt(c_min/c_d) — the rarest
    source keeps everything, a 100× larger one keeps 10%. α pinned to
    0.5 because sqrt and division are EXACTLY rounded IEEE ops, so the
    integer thresholds are bit-identical cross-engine (generic pow is
    not exactly specified). One tiny per-domain count broadcast back;
    the document side never shuffles — membership stays the pure
    hash-threshold projection (partition-independent; append-stable
    once thresholds are frozen)."""
    from nutdb_spark.operators.sampling import sample_temperature

    d = load_table(spark, sf_dir, "documents")
    return sample_temperature(
        d, F.col("doc_id"), F.col("source"), salt="temp"
    ).select("doc_id", "source")


@query(
    "q_pack_manifest",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             {_PACK_H} AS __h,
             CAST(({_PACK_H}) % {_PACK_SHARDS} AS INT) AS __shard
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, __shard,
             CAST(SUM(n_tokens) OVER (PARTITION BY __shard
                    ORDER BY __h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
      FROM t
    ), p AS (
      SELECT doc_id, n_tokens, __shard,
             CASE WHEN n_tokens > 0
                  THEN (__cum - 1) // {_PACK_BUDGET}
                       - (__cum - n_tokens) // {_PACK_BUDGET} + 1
                  ELSE 0 END AS n_seqs
      FROM c
    )
    SELECT __shard AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {_PACK_BUDGET} - 1) // {_PACK_BUDGET}
                AS BIGINT) AS n_seqs,
           CAST(SUM(CASE WHEN n_seqs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS straddlers,
           CAST(SUM({oracle_hash_bucket('doc_id', salt='manifest')})
                AS BIGINT) AS fingerprint
    FROM p GROUP BY __shard
    """,
)
def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest over the packed layout — the reproducible-loading
    artifact a trainer checks before reading a shard: doc count, total
    tokens, sequence count, boundary-straddler count, and an
    ORDER-INDEPENDENT content fingerprint (sum of salted doc-id hash
    buckets — any engine, any partition order, same value; a changed /
    missing / duplicated doc changes it). One manifest row per shard,
    map-side partial aggregation on top of the packing window's own
    hash partitioning — no extra shuffle beyond the pack itself."""
    from pyspark.sql import functions as F

    from nutdb_spark.operators.packing import pack_sequences
    from nutdb_spark.operators.sampling import hash_bucket
    from nutdb_spark.operators.text import tokenize

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(
        d, F.col("doc_id"), F.col("n_tokens"),
        budget=_PACK_BUDGET, shards=_PACK_SHARDS,
    )
    b = F.lit(_PACK_BUDGET)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        ((F.sum("n_tokens") + b - 1) / b).cast("long").alias("n_seqs"),
        F.sum(F.when(F.col("n_seqs") >= 2, 1).otherwise(0)).alias(
            "straddlers"
        ),
        F.sum(hash_bucket(F.col("doc_id"), "manifest")).alias("fingerprint"),
    )


_CURR_SHARDS = 8
_CURR_H = oracle_hash_bucket("doc_id", salt="curr")


@query(
    "q_sample_curriculum",
    f"""
    WITH t AS (
      SELECT doc_id, length(text) AS len,
             CAST(({_CURR_H}) % {_CURR_SHARDS} AS INT) AS shard
      FROM documents
    ), b AS (
      SELECT shard, len,
             CAST(ntile(10) OVER (PARTITION BY shard ORDER BY len, doc_id)
                  AS INT) AS bin
      FROM t
    )
    SELECT bin, COUNT(*) AS n_docs,
           CAST(MIN(len) AS BIGINT) AS min_len,
           CAST(MAX(len) AS BIGINT) AS max_len
    FROM b GROUP BY bin
    """,
)
def q_sample_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: assign each document a difficulty decile
    (length as the proxy) for staged training schedules. Scale design:
    a GLOBAL ntile would funnel the corpus through one partition, so
    deciles are computed WITHIN deterministic hash shards — each shard
    is a uniform random sample of the corpus, so shard-local deciles
    converge to the global ones at scale while the window stays one
    partition-parallel pass (PARTITION BY shard). Deterministic
    (salted-md5 shard, (len, doc_id) total order) and engine-portable;
    the DuckDB oracle runs the identical definition."""
    from nutdb_spark.operators.sampling import hash_bucket
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("len"),
        (hash_bucket(F.col("doc_id"), "curr") % _CURR_SHARDS)
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("len", "doc_id")
    b = d.withColumn("bin", F.ntile(10).over(w))
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("len").cast("long").alias("min_len"),
        F.max("len").cast("long").alias("max_len"),
    )


@query(
    "q_text_tfidf",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term
      FROM (SELECT doc_id, {oracle_normalize('text')} AS norm
            FROM documents WHERE doc_id < 300)),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM toks WHERE len(term) >= 4 GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
           FROM tf GROUP BY doc_id),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    corpus AS (SELECT COUNT(*) AS n_docs,
                      CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                        AS avgdl
               FROM dl),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
               / (CAST(df AS DOUBLE) + 0.5))
             * (CAST(tf AS DOUBLE) * 2.2)
             / (CAST(tf AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
               AS score
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id),
           corpus),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term ASC) AS rank
          FROM scored)
    SELECT doc_id, term, tf, df, score, rank FROM r WHERE rank <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword extraction with a RATIONAL idf — the full float
    score is oracled (not just the integer tf/df core of
    q_text_termstats): every op is an exactly-rounded IEEE +,*,/
    over identical operands, so score doubles hash-match DuckDB.
    Corpus stats (N, avgdl) are a broadcast 1-row aggregate; the
    rest is equi-join + bounded window — the same shape at 100 TB."""
    from nutdb_spark.operators.text import bm25_top_terms

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return bm25_top_terms(d, "doc_id", "text", min_len=4, top_per_doc=3)


@query(
    "q_sample_quota",
    f"""
    SELECT doc_id, source, lang FROM (
      SELECT doc_id, source, lang,
             {oracle_quota('doc_id', 'source', 10, salt='q')} AS keep
      FROM documents) t
    WHERE keep
    """,
)
def q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-quota stratified sample: the 10 lowest hash-ranked docs
    per source — guarantees min(10, |stratum|) rows per stratum where
    the fraction samplers under/over-shoot small strata (the eval-set
    construction primitive). One shuffle on the stratum; the oracle
    replays the identical md5 rank."""
    from nutdb_spark.operators.sampling import sample_quota

    d = load_table(spark, sf_dir, "documents")
    return sample_quota(
        d, F.col("doc_id"), F.col("source"), 10, salt="q"
    ).select("doc_id", "source", "lang")


@query(
    "q_text_bigram_lm",
    f"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim({oracle_normalize('text')}),
                                        '\\s+') AS w
      FROM documents WHERE doc_id < 400),
    occ AS (
      SELECT doc_id, unnest({oracle_ngrams('w', 2)}) AS bg FROM base),
    cnt AS (SELECT bg, COUNT(*) AS c FROM occ GROUP BY bg),
    per AS (
      SELECT occ.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS rare_cnt,
             CAST(SUM(c) AS BIGINT) AS sum_c
      FROM occ JOIN cnt USING (bg) GROUP BY occ.doc_id)
    SELECT base.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           COALESCE(rare_cnt, 0) AS rare_cnt,
           CASE WHEN n_bigrams > 0
                THEN CAST(rare_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                END AS rare_rate,
           CASE WHEN n_bigrams > 0
                THEN CAST(sum_c AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                END AS avg_bg_cnt
    FROM base LEFT JOIN per USING (doc_id)
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM rarity scoring — the CCNet perplexity-filter shape
    with EXACT arithmetic: corpus bigram counts (train) joined back to
    each document's bigram occurrences (score), yielding n_bigrams,
    rare_cnt, rare_rate, avg_bg_cnt. The rates are single double
    divisions over exact int64 sums (a float log-perplexity is libm
    and never hash-oracles; rare-bigram rate is the same filter
    signal). Short docs keep n = 0 and NULL rates. Scale: explode →
    map-side-partial count groupBy → shuffle equi-join on the bigram
    key → one groupBy(doc) — no collects, no UDFs."""
    from nutdb_spark.operators.text import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return bigram_lm_scores(d, "doc_id", "text", rare_threshold=2)


@query(
    "q_split_kfold",
    f"""
    WITH a AS (
      SELECT {oracle_kfold('doc_id', 5)} AS fold, n_chars FROM documents),
    per AS (
      SELECT fold, COUNT(*) AS n_val,
             CAST(SUM(n_chars) AS BIGINT) AS chars_val
      FROM a GROUP BY fold)
    SELECT fold, n_val, chars_val,
           (SELECT COUNT(*) FROM a) - n_val AS n_train
    FROM per
    """,
)
def q_split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation splits (k = 5) by salted hash — fold
    membership is a pure function of doc_id, so re-runs, appends, and
    repartitionings never move a document across folds (the
    contamination guarantee, k ways). Training-set sizes come from the
    complement identity total − |fold| — at 100 TB you assign ONCE and
    filter per fold; materializing k training sets k×-scans the
    corpus."""
    from pyspark.sql import Window

    from nutdb_spark.operators.sampling import kfold

    d = load_table(spark, sf_dir, "documents")
    per = (
        kfold(d, F.col("doc_id"), 5)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_val"),
            F.sum("n_chars").cast("bigint").alias("chars_val"),
        )
    )
    total = F.sum("n_val").over(Window.partitionBy())
    return per.select(
        "fold", "n_val", "chars_val",
        (total - F.col("n_val")).cast("long").alias("n_train"),
    )


@query(
    "q_text_readability",
    (lambda m: f"""
    SELECT doc_id,
           {m['n_words']} AS n_words,
           {m['n_sentences']} AS n_sentences,
           {m['n_syllables']} AS n_syllables,
           {m['flesch']} AS flesch,
           {m['ttr']} AS ttr
    FROM documents WHERE doc_id < 500
    """)(oracle_readability("text")),
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability + lexical-diversity quality scoring: Flesch reading
    ease from exact word/sentence/vowel-group-syllable counts (the
    dictionary-free heuristic — same filter signal) and type-token
    ratio, each a fixed double expression over exact int64 counts so
    the floats hash-oracle. Pure projection (whole-stage codegen, no
    shuffle) — scales as the scan, the quality-filter contract."""
    from nutdb_spark.operators.text import readability_metrics

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    m = readability_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["n_sentences"].alias("n_sentences"),
        m["n_syllables"].alias("n_syllables"),
        m["flesch"].alias("flesch"),
        m["ttr"].alias("ttr"),
    )


# --- [EXT] deterministic BPE tokenization ----------------------------------

from nutdb_spark.operators.bpe import (  # noqa: E402
    bpe_token_counts,
    bpe_word_tokens,
    oracle_bpe_token_count_text,
    oracle_bpe_tokens_text,
    oracle_bpe_tokens_word,
)

_BPE_CNT = oracle_bpe_token_count_text("text")


_BPE_PREFIX3 = (
    "array_to_string((regexp_extract_all(lower(text), "
    "'[a-z0-9]+|[^a-z0-9\\s]'))[1:3], ' ')"
)


@query(
    "q_text_bpe",
    f"""
    WITH c AS (
      SELECT doc_id, {_BPE_CNT} AS bpe_tokens,
             len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
             {oracle_bpe_tokens_text(_BPE_PREFIX3)} AS pf
      FROM documents)
    SELECT doc_id, bpe_tokens, ws_tokens,
           array_to_string(pf, ' ') AS sample
    FROM c ORDER BY doc_id
    """,
)
def q_text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic BPE encode (greedy byte-pair merges over the
    committed fixture-trained vocab, operators/bpe.py) — the
    token-exact budget the packing/chunking operators need. BOTH
    output paths are vocabulary-bound: the O(R·|word|) fold runs once
    per DISTINCT word, counts reach documents through explode +
    equi-join + re-aggregate, and the visible token sample (first 3
    words) is REASSEMBLED from the same distinct-word encodings via a
    positional explode + join + ordered collect — the shape a packing
    writer uses to emit the actual token stream, never a per-row
    re-fold of the corpus (measured 9× cheaper at sf1). JVM-side
    throughout; the DuckDB oracle replays the identical fold."""
    from nutdb_spark.operators.bpe import _WORD_RE, encode_distinct_words

    d = load_table(spark, sf_dir, "documents")
    counts = bpe_token_counts(d, F.col("doc_id"), F.col("text")).select(
        F.col("key").alias("doc_id"), "bpe_tokens"
    )
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)
    vocab = encode_distinct_words(d, F.col("text")).select(
        "word",
        # word-level fold, not the text-level regex chain: vocab rows
        # ARE single _WORD_RE matches, for which pre-tokenization is
        # the identity — bit-identical and cheaper on short strings
        bpe_word_tokens(F.col("word")).alias("__toks"),
    )
    sample = (
        d.select(
            "doc_id",
            F.posexplode(F.slice(words, 1, 3)).alias("__p", "word"),
        )
        .join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("__p").alias("p"),
                                    F.col("__toks").alias("t"),
                                )
                            )
                        ),
                        lambda s: s["t"],
                    )
                ),
            ).alias("sample")
        )
    )
    per_doc = d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("ws_tokens"),
    )
    return (
        per_doc.join(counts, "doc_id")
        .join(sample, "doc_id", "left")
        .select(
            "doc_id",
            "bpe_tokens",
            "ws_tokens",
            F.coalesce(F.col("sample"), F.lit("")).alias("sample"),
        )
        .orderBy("doc_id")
    )


_PACKB_H = oracle_hash_bucket("doc_id", salt="packbpe", grain=_PACK_GRAIN)


@query(
    "q_pack_bpe",
    f"""
    WITH t AS (
      SELECT doc_id, {_BPE_CNT} AS n_tokens,
             {_PACKB_H} AS __h,
             CAST(({_PACKB_H}) % {_PACK_SHARDS} AS INT) AS __shard
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, __shard,
             CAST(SUM(n_tokens) OVER (PARTITION BY __shard
                    ORDER BY __h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
      FROM t
    )
    SELECT doc_id, n_tokens, __shard AS shard,
           (__cum - n_tokens) // {_PACK_BUDGET} AS seq,
           (__cum - n_tokens) % {_PACK_BUDGET} AS "offset",
           CASE WHEN n_tokens > 0
                THEN (__cum - 1) // {_PACK_BUDGET}
                     - (__cum - n_tokens) // {_PACK_BUDGET} + 1
                ELSE 0 END AS n_seqs
    FROM c
    """,
)
def q_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing with BPE-token-exact budgets: q_pack_sequences'
    layout (per-shard ROWS-window cumsum, one shuffle, no global sort)
    re-based on real tokenizer counts instead of whitespace words —
    context windows are sized in BPE tokens. Counts come from the
    vocabulary-sized distinct-word join (operators/bpe.py), so the
    token-counting stage stays scan-linear at 100 TB."""
    from nutdb_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    counts = bpe_token_counts(d, F.col("doc_id"), F.col("text")).select(
        F.col("key").alias("doc_id"),
        F.col("bpe_tokens").alias("n_tokens"),
    )
    return pack_sequences(
        counts,
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_PACK_BUDGET,
        shards=_PACK_SHARDS,
        salt="packbpe",
    )


@query(
    "q_pack_emit",
    f"""
    WITH t AS (
      SELECT doc_id, {oracle_bpe_tokens_text('text')} AS toks,
             {_PACKB_H} AS __h,
             CAST(({_PACKB_H}) % {_PACK_SHARDS} AS INT) AS __shard
      FROM documents
    ), c AS (
      SELECT __shard, toks, len(toks) AS n,
             CAST(SUM(len(toks)) OVER (PARTITION BY __shard
                    ORDER BY __h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - len(toks) AS s
      FROM t
    ), f AS (
      SELECT __shard, toks, n, s,
             unnest(generate_series(s // {_PACK_BUDGET},
                                    (s + n - 1) // {_PACK_BUDGET})) AS q
      FROM c WHERE n > 0
    ), g AS (
      SELECT __shard, q,
             GREATEST(s - q * {_PACK_BUDGET}, 0) AS off,
             list_slice(toks,
                        GREATEST(q * {_PACK_BUDGET} - s, 0) + 1,
                        LEAST(n, (q + 1) * {_PACK_BUDGET} - s)) AS frag
      FROM f
    ), h AS (
      SELECT __shard AS shard, q AS seq,
             flatten(list(frag ORDER BY off)) AS ts
      FROM g GROUP BY 1, 2
    )
    SELECT shard, seq, CAST(len(ts) AS BIGINT) AS n_tokens,
           array_to_string(ts, ' ') AS tokens
    FROM h ORDER BY shard, seq
    """,
)
def q_pack_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Materialize the packed token STREAM — the last step of
    the packing story: q_pack_bpe computes where each document's
    tokens land; this entry emits the actual fixed-budget sequences a
    trainer reads. Per-doc token arrays come from the vocabulary-bound
    join encoder (bpe_tokens_by_join — the O(R·|word|) fold runs once
    per DISTINCT word); each doc then explodes into n_seqs array
    SLICES (almost always 1-2 rows — never per-token explode), and a
    groupBy (shard, seq) reassembles fragments by their in-sequence
    offset (ordered collect + flatten). Work is O(total tokens) —
    scan-linear, the cost of writing the output at all — with one
    extra shuffle beyond the layout (the fragment regroup on
    (shard, seq), which at 100 TB is also the writer's natural output
    partitioning). Invariant pinned in tests: every sequence except
    the last per shard carries exactly `budget` tokens."""
    from nutdb_spark.operators.bpe import bpe_tokens_by_join
    from nutdb_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    toks = bpe_tokens_by_join(d, F.col("doc_id"), F.col("text")).select(
        F.col("key").alias("doc_id"),
        "toks",
        F.size("toks").cast("long").alias("n_tokens"),
    )
    p = pack_sequences(
        toks,
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_PACK_BUDGET,
        shards=_PACK_SHARDS,
        salt="packbpe",
    )
    b = F.lit(_PACK_BUDGET).cast("long")
    start = F.col("seq") * b + F.col("offset")
    frag = (
        p.where(F.col("n_seqs") > 0)
        .select(
            "shard",
            "toks",
            "n_tokens",
            start.alias("__s"),
            F.explode(
                F.sequence(F.col("seq"), F.col("seq") + F.col("n_seqs") - 1)
            ).alias("seq"),
        )
        .select(
            "shard",
            "seq",
            F.greatest(F.col("__s") - F.col("seq") * b, F.lit(0)).alias(
                "__off"
            ),
            F.slice(
                F.col("toks"),
                F.greatest(
                    F.col("seq") * b - F.col("__s"), F.lit(0)
                ).cast("int")
                + 1,
                (
                    F.least(
                        F.col("n_tokens"),
                        (F.col("seq") + 1) * b - F.col("__s"),
                    )
                    - F.greatest(F.col("seq") * b - F.col("__s"), F.lit(0))
                ).cast("int"),
            ).alias("__frag"),
        )
    )
    return (
        frag.groupBy("shard", "seq")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__off").alias("o"),
                                F.col("__frag").alias("f"),
                            )
                        )
                    ),
                    lambda s: s["f"],
                )
            ).alias("ts")
        )
        .select(
            "shard",
            "seq",
            F.size("ts").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "ts").alias("tokens"),
        )
        .orderBy("shard", "seq")
    )


@query(
    "q_text_token_ids",
    f"""
    WITH w AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text),
               '[a-z0-9]+|[^a-z0-9\\s]')) AS word FROM documents
    ), tk AS (
      SELECT DISTINCT unnest({oracle_bpe_tokens_word('word')}) AS tok
      FROM w
    ), v AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS BIGINT)
               AS tid
      FROM tk
    ), docs AS (
      SELECT doc_id, {oracle_bpe_tokens_text('text')} AS toks
      FROM documents
    ), e AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS p
      FROM docs
    ), g AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             array_to_string(list(tid ORDER BY p), ' ') AS ids
      FROM e JOIN v USING (tok) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(g.n_tokens, 0) AS n_tokens,
           COALESCE(g.ids, '') AS ids
    FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
    ORDER BY d.doc_id
    """,
)
def q_text_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Trainer-ready token IDS: the BPE token stream mapped to
    dense integer ids through the corpus vocabulary (distinct tokens,
    lexicographic id order — deterministic and replayable without
    shipping a dictionary). Completes the tokenizer story: q_text_bpe
    counts, q_pack_emit streams strings, this emits what a trainer
    embeds. The vocab-id table is vocabulary-sized (its row_number
    window is one bounded sort); per-doc assembly is the same
    positional explode + equi-join + ordered collect as the emit path
    — scan-linear, zero Python nodes."""
    from pyspark.sql import Window

    from nutdb_spark.operators.bpe import (
        bpe_tokens_by_join,
        bpe_word_tokens,
        encode_distinct_words,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = bpe_tokens_by_join(d, F.col("doc_id"), F.col("text")).select(
        F.col("key").alias("doc_id"), "toks"
    )
    vocab = (
        encode_distinct_words(d, F.col("text"))
        .select(F.explode(bpe_word_tokens(F.col("word"))).alias("tok"))
        .distinct()
        .select(
            "tok",
            (
                F.row_number().over(Window.orderBy("tok")) - 1
            ).cast("long").alias("tid"),
        )
    )
    ids = (
        toks.select(
            "doc_id", F.posexplode("toks").alias("__p", "tok")
        )
        .join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__p").alias("p"),
                                F.col("tid").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"].cast("string"),
                ),
            ).alias("ids"),
        )
    )
    return (
        d.select("doc_id")
        .join(ids, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.coalesce(F.col("ids"), F.lit("")).alias("ids"),
        )
        .orderBy("doc_id")
    )


# --- [EXT] hashed-linear quality-classifier inference ------------------------

from nutdb_spark.operators.quality_clf import (  # noqa: E402
    classifier_keep,
    classifier_logit,
    oracle_classifier_keep,
    oracle_classifier_logit,
)


@query(
    "q_text_classifier",
    f"""
    SELECT doc_id,
           {oracle_classifier_logit('text')} AS logit,
           {oracle_classifier_keep('text')} AS keep
    FROM documents ORDER BY doc_id
    """,
)
def q_text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] fastText-style quality-classifier inference: exact int64
    logit = bias + Σ_word W[md5bucket(word)] over the committed
    offline-trained weight table (tools/train_quality_clf.py, 95.2%
    on the fixture labels), keep = logit > 0. A pure per-row HOF fold
    — the 64-int weight 'broadcast' folds into the expression, no
    shuffle, no UDF; the model-swap path at 100 TB is one literal."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        classifier_logit(F.col("text")).alias("logit"),
        classifier_keep(F.col("text")).alias("keep"),
    ).orderBy("doc_id")


# --- [EXT] fill-in-the-middle transform --------------------------------------

from nutdb_spark.operators.text import fim_transform, oracle_fim  # noqa: E402

_FIM_ORA = oracle_fim("doc_id", "text")


@query(
    "q_text_fim",
    f"""
    SELECT doc_id,
           {_FIM_ORA['fim_applied']} AS fim_applied,
           {_FIM_ORA['p1']} AS p1,
           {_FIM_ORA['p2']} AS p2,
           {_FIM_ORA['out_text']} AS out_text
    FROM documents ORDER BY doc_id
    """,
)
def q_text_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Fill-in-the-middle training transform (the code-model
    data-prep step): a deterministic 50% of documents rewritten
    PSM-style as <PRE> prefix <SUF> suffix <MID> middle with salted-
    md5 split points, the rest untouched. Append-stable (a doc's
    transform never changes as the corpus grows), engine-portable,
    and a pure projection — no shuffle, no UDF, scales as the scan."""
    d = load_table(spark, sf_dir, "documents")
    cols = fim_transform(F.col("doc_id"), F.col("text"))
    return d.select(
        "doc_id",
        cols["fim_applied"].alias("fim_applied"),
        cols["p1"].alias("p1"),
        cols["p2"].alias("p2"),
        cols["out_text"].alias("out_text"),
    ).orderBy("doc_id")


@query(
    "q_sample_ccnet",
    f"""
    WITH base AS (
      SELECT doc_id, lang,
             string_split_regex(trim({oracle_normalize('text')}),
                                '\\s+') AS w
      FROM documents WHERE doc_id < 400),
    occ AS (
      SELECT doc_id, unnest({oracle_ngrams('w', 2)}) AS bg FROM base),
    cnt AS (SELECT bg, COUNT(*) AS c FROM occ GROUP BY bg),
    per AS (
      SELECT occ.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS rare_cnt
      FROM occ JOIN cnt USING (bg) GROUP BY occ.doc_id),
    scored AS (
      SELECT base.doc_id, base.lang,
             CAST(rare_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
               AS rare_rate
      FROM base JOIN per USING (doc_id) WHERE n_bigrams > 0),
    tiled AS (
      SELECT doc_id, lang, rare_rate,
             CAST(ntile(3) OVER (PARTITION BY lang
                    ORDER BY rare_rate ASC, doc_id) AS INT) AS bucket
      FROM scored)
    SELECT doc_id, lang, bucket, rare_rate
    FROM tiled WHERE bucket <= 2 ORDER BY doc_id
    """,
)
def q_sample_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CCNet-style perplexity-bucket selection, composed from
    the exact bigram-LM rarity score: per LANGUAGE, documents rank
    into terciles by rare-bigram rate (head = most fluent) via
    ntile(3), and the head + middle buckets are kept — the actual
    CCNet recipe with the engine's oracle-exact rarity standing in
    for the float LM perplexity (same monotone signal). Docs too
    short to score (no bigrams) are dropped before tiling, avoiding
    cross-engine NULL-ordering divergence. Scale: the scoring joins
    are q_text_bigram_lm's; the tiling is one per-language window —
    at 100 TB the exact ntile becomes a two-pass histogram cut, the
    documented trade for a global order within each language."""
    from pyspark.sql import Window

    from nutdb_spark.operators.text import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    scores = bigram_lm_scores(d, "doc_id", "text", rare_threshold=2)
    scored = (
        scores.filter(F.col("n_bigrams") > 0)
        .join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "rare_rate")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("rare_rate").asc(), F.col("doc_id")
    )
    return (
        scored.withColumn("bucket", F.ntile(3).over(w))
        .where(F.col("bucket") <= 2)
        .select("doc_id", "lang", "bucket", "rare_rate")
        .orderBy("doc_id")
    )


def _gopher_oracle_sql() -> str:
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, oracle_gopher

    g = oracle_gopher("text", stopwords=ENGLISH_STOPWORDS)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in g.items())
    return f"SELECT doc_id, {cols} FROM documents WHERE doc_id < 400"


@query("q_text_gopher", _gopher_oracle_sql())
def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The Gopher/MassiveWeb quality rule set (Rae et al. 2021,
    App. A): seven published document-quality rules as exact integer
    counters + boolean decisions + the composite ``passes`` gate, one
    codegen'd projection over the scan. The fixture corpus splits on
    the 50-word minimum and the distinct-stopword rule, so the gate
    bit carries signal, not a constant. The stop list is the engine's
    English list (the published 8-word list stays the operator
    default; the rule is corpus-language-dependent by design and the
    fixture vocabulary contains only 'the' from the published list,
    which would pin ok_stop — and the gate — constant-false)."""
    from nutdb_spark.operators.text import (
        ENGLISH_STOPWORDS,
        GOPHER_FIELDS,
        gopher_struct,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    # bind the struct to a column FIRST: 16 projected fields over one
    # evaluation (CollapseProject keeps the two projections apart for
    # non-cheap producers, so the struct is materialized once per row)
    return d.withColumn(
        "__g", gopher_struct(F.col("text"), stopwords=ENGLISH_STOPWORDS)
    ).select(
        "doc_id", *[F.col("__g")[n].alias(n) for n in GOPHER_FIELDS]
    )


def _dsir_oracle_sql() -> str:
    from nutdb_spark.operators.sampling import oracle_dsir_scores

    inner = oracle_dsir_scores("lang = 'en'", where="doc_id < 400")
    return f"""
WITH scored AS ({inner})
SELECT doc_id, n_feats, score, rk FROM (
  SELECT doc_id, n_feats, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rk
  FROM scored) t
WHERE rk <= 150 ORDER BY doc_id"""


@query("q_sample_dsir", _dsir_oracle_sql())
def q_sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DSIR-style importance resampling (Xie et al. 2023):
    hashed unigram+bigram features, add-one-smoothed target/raw count
    ratios in fixed point (exact int64 — the engine's stand-in for
    the paper's log-likelihood ratio, same selection signal), target
    = the labeled-English subset, keep the top 150 of the 400-doc
    slice by (score DESC, doc_id). The feature-count table is
    dim-bounded (4096 buckets) so at 100 TB it broadcasts; the final
    cut is the TWO-PASS HISTOGRAM top-k (operators/sampling.py
    global_topk) — bucket histogram + ≤k-bucket candidate join +
    k-bounded exact rank, never a corpus-sized single-partition sort;
    the oracle stays the naive window because the ranks are
    bit-identical."""
    from nutdb_spark.operators.sampling import dsir_scores, global_topk

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    scored = dsir_scores(d, "doc_id", "text", F.col("lang") == "en")
    return (
        global_topk(scored, F.col("score"), F.col("doc_id"), 150)
        .select("doc_id", "n_feats", "score", "rk")
        .orderBy("doc_id")
    )


def _epoch_shuffle_oracle() -> str:
    from nutdb_spark.operators.packing import oracle_epoch_shuffle

    e1 = oracle_epoch_shuffle("doc_id", epoch=1, shards=8)
    e2 = oracle_epoch_shuffle("doc_id", epoch=2, shards=8)
    return f"""
SELECT doc_id,
       {e1['eshard']} AS eshard1, {e1['pos']} AS pos1,
       {e2['eshard']} AS eshard2, {e2['pos']} AS pos2
FROM documents WHERE doc_id < 400 ORDER BY doc_id"""


@query("q_pack_shuffle", _epoch_shuffle_oracle())
def q_pack_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic per-epoch training-order shuffle (the step
    between packing and the trainer): epochs 1 and 2 of the same
    corpus slice land each unit in an (eshard, pos) reading position;
    different epochs are independently ordered (different salted
    hashes), identical re-runs are bit-stable, and resuming epoch 2
    replays its exact order with no RNG state. Keyed by doc_id here;
    keying by the packed (shard, seq) ids is the same plan. One hash
    partition + per-shard rank window per epoch — shards bound the
    sort, readers consume shard-parallel."""
    from nutdb_spark.operators.packing import epoch_shuffle

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    e1 = epoch_shuffle(
        d.select("doc_id"), F.col("doc_id"), epoch=1, shards=8
    ).withColumnsRenamed({"eshard": "eshard1", "pos": "pos1"})
    e2 = epoch_shuffle(
        d.select("doc_id"), F.col("doc_id"), epoch=2, shards=8
    ).withColumnsRenamed({"eshard": "eshard2", "pos": "pos2"})
    return e1.join(e2, "doc_id").orderBy("doc_id")


def _bpe_train_oracle() -> str:
    from nutdb_spark.operators.bpe import oracle_bpe_train

    return oracle_bpe_train(8)


@query("q_bpe_train", _bpe_train_oracle())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distributed BPE vocabulary TRAINING (completes the
    tokenizer story: q_text_bpe encodes with a trained table; this
    entry learns one in-engine). Eight rounds of corpus-wide pair
    counting with the (count DESC, pair ASC) argmax — each round is a
    vocabulary-sized fold + pair groupBy with ONE driver-side row
    (the k-means bounded-collect precedent) — and the DuckDB oracle
    replays the whole training loop unrolled, argmax and merge-apply
    included. At sf0.01 the learned table equals the committed
    BPE_MERGES prefix (pinned in tests), which is the claim that the
    committed fixture is reproducible in-engine."""
    from nutdb_spark.operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    learned = bpe_train(d, F.col("text"), 8)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(learned)],
        "rk long, a string, b string, cnt long",
    ).orderBy("rk")


def _sentiment_oracle() -> str:
    from nutdb_spark.operators.text import oracle_sentiment

    g = oracle_sentiment("text")
    cols = ", ".join(f"{sql} AS {n}" for n, sql in g.items())
    return f"SELECT doc_id, {cols} FROM documents WHERE doc_id < 400 ORDER BY doc_id"


@query("q_text_sentiment", _sentiment_oracle())
def q_text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Lexicon-based sentiment scoring (the classic
    Spark-at-scale text-analytics job — the retrieved-corpus Twitter
    sentiment line of work): exact integer valence sums from the
    committed AFINN-style lexicon, matched-token counts, and the sign
    label. Pure projection; the fixture vocabulary splits across
    pos/neg/neu so every output column carries signal."""
    from nutdb_spark.operators.text import sentiment_scores

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    g = sentiment_scores(F.col("text"))
    return d.select(
        "doc_id", *[c.alias(n) for n, c in g.items()]
    ).orderBy("doc_id")


# --- [EXT] round-13: hashed-linear language ID -------------------------------


def _langid_clf_oracle() -> str:
    from nutdb_spark.operators.langid_clf import oracle_langid_scores

    inner = oracle_langid_scores()
    return f"""
    WITH scored AS ({inner})
    SELECT s.doc_id, s.lang_pred, s.score, d.lang AS label,
           (s.lang_pred = d.lang) AS correct
    FROM scored s JOIN documents d USING (doc_id)
    ORDER BY s.doc_id"""


@query("q_text_langid_clf", _langid_clf_oracle())
def q_text_langid_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] fastText-style language ID as a hashed-linear multi-class
    model (operators/langid_clf.py — committed offline-trained integer
    weights, 96.6% on the fixture's five languages): per document the
    predicted language, its exact integer logit, the fixture label and
    the hit bit. Replaces the r2 stopword-profile heuristic as the
    pre-per-language-sampling stage. Scale: sparse dim-bounded weight
    table broadcast + one per-doc aggregation — the DSIR shape."""
    from nutdb_spark.operators.langid_clf import langid_scores

    d = load_table(spark, sf_dir, "documents")
    return (
        langid_scores(d, "doc_id", "text")
        .join(d.select("doc_id", F.col("lang").alias("label")), "doc_id")
        .select(
            "doc_id",
            "lang_pred",
            "score",
            "label",
            (F.col("lang_pred") == F.col("label")).alias("correct"),
        )
        .orderBy("doc_id")
    )


def _ccnet_langid_oracle() -> str:
    from nutdb_spark.operators.langid_clf import oracle_langid_scores
    from nutdb_spark.operators.text import oracle_ngrams, oracle_normalize

    langid = oracle_langid_scores()
    return f"""
    WITH lid AS ({langid}),
    base AS (
      SELECT doc_id,
             string_split_regex(trim({oracle_normalize('text')}),
                                '\\s+') AS w
      FROM documents WHERE doc_id < 400),
    occ AS (
      SELECT doc_id, unnest({oracle_ngrams('w', 2)}) AS bg FROM base),
    cnt AS (SELECT bg, COUNT(*) AS c FROM occ GROUP BY bg),
    per AS (
      SELECT occ.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS rare_cnt
      FROM occ JOIN cnt USING (bg) GROUP BY occ.doc_id),
    scored AS (
      SELECT base.doc_id, lid.lang_pred,
             CAST(rare_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
               AS rare_rate
      FROM base JOIN per USING (doc_id) JOIN lid USING (doc_id)
      WHERE n_bigrams > 0),
    tiled AS (
      SELECT doc_id, lang_pred, rare_rate,
             CAST(ntile(3) OVER (PARTITION BY lang_pred
                    ORDER BY rare_rate ASC, doc_id) AS INT) AS bucket
      FROM scored)
    SELECT doc_id, lang_pred, bucket, rare_rate
    FROM tiled WHERE bucket <= 2 ORDER BY doc_id
    """


@query("q_sample_ccnet_langid", _ccnet_langid_oracle())
def q_sample_ccnet_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The CCNet bucket selection keyed on the PREDICTED
    language (q_sample_ccnet uses the fixture label): langid_clf's
    argmax feeds the per-language tercile windows — the actual
    production composition, where no label column exists and the
    classifier's output IS the partition key for every per-language
    stage downstream."""
    from pyspark.sql import Window

    from nutdb_spark.operators.langid_clf import langid_scores
    from nutdb_spark.operators.text import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    lid = langid_scores(d, "doc_id", "text").select("doc_id", "lang_pred")
    dd = d.filter(F.col("doc_id") < 400)
    scores = bigram_lm_scores(dd, "doc_id", "text", rare_threshold=2)
    scored = (
        scores.filter(F.col("n_bigrams") > 0)
        .join(lid, "doc_id")
        .select("doc_id", "lang_pred", "rare_rate")
    )
    w = Window.partitionBy("lang_pred").orderBy(
        F.col("rare_rate").asc(), F.col("doc_id")
    )
    return (
        scored.withColumn("bucket", F.ntile(3).over(w))
        .where(F.col("bucket") <= 2)
        .select("doc_id", "lang_pred", "bucket", "rare_rate")
        .orderBy("doc_id")
    )


def _temp_langid_oracle() -> str:
    from nutdb_spark.operators.langid_clf import oracle_langid_scores
    from nutdb_spark.operators.sampling import oracle_hash_bucket

    langid = oracle_langid_scores()
    return f"""
    WITH lid AS ({langid}),
    c AS (SELECT lang_pred, COUNT(*) AS cnt FROM lid GROUP BY lang_pred),
    m AS (SELECT MIN(cnt) AS cmin FROM c),
    r AS (SELECT lang_pred,
                 CAST(FLOOR(1000000 * SQRT(CAST(cmin AS DOUBLE)
                                           / CAST(cnt AS DOUBLE)))
                      AS BIGINT) AS thr
          FROM c, m)
    SELECT l.doc_id, l.lang_pred
    FROM lid l JOIN r USING (lang_pred)
    WHERE {oracle_hash_bucket('l.doc_id', salt='templang')} < r.thr
    ORDER BY l.doc_id
    """


@query("q_sample_temperature_langid", _temp_langid_oracle())
def q_sample_temperature_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Temperature-based LANGUAGE rebalancing on the PREDICTED
    language (q_sample_temperature mixes by the source column; the
    multilingual pipeline mixes by language, and at ingest no label
    exists — the classifier's argmax is the domain key). α = 0.5
    per-language keep rates sqrt(c_min/c_lang) over langid_clf's
    predictions; the per-language count table broadcasts, membership
    stays the pure hash-threshold projection. The langid → mixing
    composition is the second half of the verdict's task-3 'composed
    into temperature/ccnet language keys'."""
    from nutdb_spark.operators.langid_clf import langid_scores
    from nutdb_spark.operators.sampling import sample_temperature

    d = load_table(spark, sf_dir, "documents")
    lid = langid_scores(d, "doc_id", "text").select("doc_id", "lang_pred")
    return (
        sample_temperature(
            lid, F.col("doc_id"), F.col("lang_pred"), salt="templang"
        )
        .select("doc_id", "lang_pred")
        .orderBy("doc_id")
    )


# --- [EXT] round-13: Group-DRO / DoReMi domain-mixture reweighting -----------


def _doremi_oracle() -> str:
    from nutdb_spark.operators.mixing import oracle_dro
    from nutdb_spark.operators.sampling import oracle_hash_bucket

    dro = oracle_dro("lang", "text")
    return f"""
    WITH o AS ({dro}),
    tot AS (SELECT SUM(w_final) AS tw, SUM(n_docs) AS nd FROM o),
    mix AS (
      SELECT domain, n_docs, loss, w_final,
             CAST(FLOOR(CAST(1000000 * w_final AS DOUBLE) / tot.tw)
                  AS BIGINT) AS mix_ppm
      FROM o, tot),
    q AS (
      SELECT mix.*,
             LEAST(1000000,
               CAST(FLOOR(CAST(1000000 *
                 CAST(FLOOR(CAST(tot.nd * mix_ppm AS DOUBLE) / 1000000)
                      AS BIGINT) AS DOUBLE) / n_docs) AS BIGINT)) AS thr
      FROM mix, tot),
    k AS (
      SELECT d.lang AS domain, CAST(COUNT(*) AS BIGINT) AS kept
      FROM documents d JOIN q ON d.lang = q.domain
      WHERE {oracle_hash_bucket('d.doc_id', salt='doremi')} < q.thr
      GROUP BY d.lang)
    SELECT q.domain, q.n_docs, q.loss, q.w_final, q.mix_ppm, q.thr,
           COALESCE(k.kept, 0) AS kept
    FROM q LEFT JOIN k USING (domain)
    ORDER BY q.domain"""


@query("q_mix_doremi", _doremi_oracle())
def q_mix_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DoReMi / Group-DRO domain-mixture reweighting
    (operators/mixing.py): per-language losses from the quality
    classifier, eight quantized multiplicative-weights rounds pushing
    weight toward the hardest languages, then the mixture applied as
    deterministic hash-threshold sampling (the temperature-mixing
    shape). Emits the whole decision per domain: loss, final weight,
    mixture ppm, keep threshold, and the docs actually kept. The
    corpus-sized work is ONE per-domain aggregation; the MW loop runs
    on the k collected domain rows (bounded collect — the
    bpe_train/k-means precedent) and the oracle replays it unrolled.
    """
    from nutdb_spark.operators.mixing import (
        DRO_W0,
        _floordiv,
        domain_losses,
        dro_mixture,
    )
    from nutdb_spark.operators.sampling import GRAIN, hash_bucket

    d = load_table(spark, sf_dir, "documents")
    rows = sorted(
        (r["domain"], r["n_docs"], r["loss"])
        for r in domain_losses(d, F.col("lang"), F.col("text")).collect()
    )
    w = dict(dro_mixture(rows))
    tw = sum(w.values())
    nd = sum(n for _, n, _ in rows)
    summary = []
    for domain, n_docs, loss in rows:
        mix_ppm = _floordiv(1_000_000 * w[domain], tw)
        quota = _floordiv(nd * mix_ppm, 1_000_000)
        thr = min(GRAIN, _floordiv(GRAIN * quota, n_docs))
        summary.append(
            (domain, n_docs, loss, w[domain], mix_ppm, thr)
        )
    sdf = spark.createDataFrame(
        summary,
        "domain string, n_docs long, loss long, w_final long, "
        "mix_ppm long, thr long",
    )
    kept = (
        d.join(
            F.broadcast(sdf.select("domain", "thr")),
            d["lang"] == sdf["domain"],
        )
        .filter(hash_bucket(F.col("doc_id"), salt="doremi") < F.col("thr"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("kept"))
    )
    return (
        sdf.join(kept, "domain", "left")
        .select(
            "domain", "n_docs", "loss", "w_final", "mix_ppm", "thr",
            F.coalesce(F.col("kept"), F.lit(0)).cast("long").alias("kept"),
        )
        .orderBy("domain")
    )


# --- [EXT] round-13: BPE decode (id round-trip) -------------------------------


@query(
    "q_text_bpe_decode",
    f"""
    WITH w AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text),
               '[a-z0-9]+|[^a-z0-9\\s]')) AS word FROM documents
    ), tk AS (
      SELECT DISTINCT unnest({oracle_bpe_tokens_word('word')}) AS tok
      FROM w
    ), v AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS BIGINT)
               AS tid
      FROM tk
    ), docs AS (
      SELECT doc_id, {oracle_bpe_tokens_text('text')} AS toks
      FROM documents
    ), e AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS p
      FROM docs
    ), ids AS (
      SELECT doc_id, p, tid FROM e JOIN v USING (tok)
    ), dec AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             string_agg(v.tok, '' ORDER BY p) AS decoded
      FROM ids JOIN v USING (tid) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(dec.n_tokens, 0) AS n_tokens,
           CAST(length(COALESCE(dec.decoded, '')) AS BIGINT)
             AS decoded_len,
           COALESCE(dec.decoded, '') =
             array_to_string(regexp_extract_all(lower(d.text),
                             '[a-z0-9]+|[^a-z0-9\\s]'), '') AS ok
    FROM documents d LEFT JOIN dec ON d.doc_id = dec.doc_id
    ORDER BY d.doc_id
    """,
)
def q_text_bpe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BPE DECODE — the tokenizer round trip, through the id
    space: encode to dense ids (q_text_token_ids' vocabulary), map ids
    back through the REVERSED vocabulary, reassemble in position
    order, and compare with the normalized source text. ``ok`` is true
    on every row iff the id map is bijective (no vocab collisions) and
    the assembly is order-preserving — the two properties a trainer's
    detokenizer relies on. Same vocabulary-bound scale shape as the
    encode path — distinct-word fold + positional explodes +
    equi-joins — with ONE ordered collect at the end: the token
    stream keeps a composite (word-pos, token-pos) position through
    the encode/decode joins instead of round-tripping through a
    second per-doc array assembly (which measured 16x at 10x data;
    this shape is in family with q_text_token_ids). Zero Python
    nodes."""
    from pyspark.sql import Window

    from nutdb_spark.operators.bpe import (
        _WORD_RE,
        bpe_word_tokens,
        encode_distinct_words,
    )

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), 0)
        ).alias("pw", "word"),
    )
    # posexplode the per-word token arrays on the VOCABULARY-sized
    # side, before the corpus join: exploding the computed array after
    # the join lets Catalyst's constraint inference inline the whole
    # merge fold into corpus-side Filters (measured 15x slower)
    wtoks = encode_distinct_words(d, F.col("text")).select(
        "word",
        F.posexplode(bpe_word_tokens(F.col("word"))).alias("pt", "tok"),
    )
    toks = words.join(wtoks, "word").select("doc_id", "pw", "pt", "tok")
    vocab = (
        wtoks.select("tok")
        .distinct()
        .select(
            "tok",
            (F.row_number().over(Window.orderBy("tok")) - 1)
            .cast("long")
            .alias("tid"),
        )
    )
    ids = toks.join(vocab, "tok").select("doc_id", "pw", "pt", "tid")
    dec = (
        ids.join(vocab, "tid")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pw"),
                                F.col("pt"),
                                F.col("tok").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("decoded"),
        )
    )
    ref = F.array_join(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0
        ),
        "",
    )
    return (
        d.join(dec, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.length(F.coalesce(F.col("decoded"), F.lit("")))
            .cast("long")
            .alias("decoded_len"),
            (F.coalesce(F.col("decoded"), F.lit("")) == ref).alias("ok"),
        )
        .orderBy("doc_id")
    )


# --- [EXT] round-13: T5 span corruption ---------------------------------------


def _span_corrupt_oracle() -> str:
    from nutdb_spark.operators.text import oracle_span_corrupt

    g = oracle_span_corrupt(
        "regexp_extract_all(lower(text), '[a-z0-9]+')", "doc_id"
    )
    cols = ", ".join(f"{sql} AS {n}" for n, sql in g.items())
    return (
        f"SELECT doc_id, {cols} FROM documents "
        f"WHERE doc_id < 400 ORDER BY doc_id"
    )


@query("q_text_span_corrupt", _span_corrupt_oracle())
def q_text_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] T5-style SPAN CORRUPTION (Raffel et al. 2020) as a
    deterministic engine transform — the denoising sibling of
    q_text_fim: ~15% of tokens drop in length-3 spans recurring every
    20 positions from a hash-derived per-document phase, input gets
    <extra_id_k> sentinels, target gets '<sentinel> dropped tokens'.
    Determinism is the engine contract the published random sampler
    can't give: same doc → same corruption on any engine, re-run or
    append (the hash-assignment discipline of operators/sampling.py).
    Pure row-local array expressions — no shuffle, no UDF, scales as
    the scan."""
    from nutdb_spark.operators.text import span_corrupt_cols

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    words = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
    )
    g = span_corrupt_cols(words, F.col("doc_id"))
    return d.select(
        "doc_id", *[c.alias(n) for n, c in g.items()]
    ).orderBy("doc_id")
