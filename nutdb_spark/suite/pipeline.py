"""[EXT] End-to-end training-data cleaning pipeline over `documents`.

The composition a real LLM-data pipeline runs as one job: quality
filter → exact content dedup → near-dup removal → per-language corpus
stats. Every stage is an existing operator (text.quality /
dedup.dedup-family), so this entry pins that they COMPOSE — one
DataFrame plan end to end, verified against a DuckDB oracle that mirrors
each stage.

Scale shape: the quality filter is a pure projection+filter (pushed to
the scan where possible), exact dedup is one hash-groupBy + semi-join,
near-dup is the guarded inverted-index join, and the final stats are a
map-side-partial aggregate — no stage materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import (
    dedup_near_keep_first,
    jaccard_pairs,
    oracle_shingles,
)
from nutdb_spark.operators.text import (
    ENGLISH_STOPWORDS,
    fingerprint_md5,
    oracle_fingerprint_md5,
    oracle_readability,
    oracle_stopword_ratio,
    stopword_ratio,
    tokenize,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_MIN_TOKENS = 20
_MIN_STOPWORD = 0.05
_NGRAM = 4
_JACCARD_THR = 0.6
_MAX_FREQ = 100

_W = "string_split_regex(trim(text), '\\s+')"


def _oracle() -> str:
    from nutdb_spark.operators.quality_clf import oracle_classifier_keep

    sw = oracle_stopword_ratio("w", ENGLISH_STOPWORDS)
    return f"""
WITH q AS (
  SELECT doc_id, lang, text, {_W} AS w FROM documents),
kept AS (
  SELECT * FROM q
  WHERE len(w) >= {_MIN_TOKENS} AND {sw} >= {_MIN_STOPWORD}
    AND {oracle_classifier_keep('text')}),
reps AS (
  SELECT MIN(doc_id) AS doc_id FROM kept
  GROUP BY {oracle_fingerprint_md5('text')}),
surv AS (SELECT k.* FROM kept k JOIN reps USING (doc_id)),
toks AS (
  SELECT doc_id, {oracle_shingles('text', _NGRAM)} AS sh FROM surv),
sizes AS (SELECT doc_id, len(sh) AS n FROM toks),
ex0 AS (SELECT doc_id, unnest(sh) AS s FROM toks),
keep AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= {_MAX_FREQ}),
ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN keep USING (s)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
neardup AS (
  SELECT DISTINCT p.id_b FROM pairs p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
  WHERE p.shared * 1.0 / (sa.n + sb.n - p.shared) >= {_JACCARD_THR}),
clean AS (
  SELECT s.* FROM surv s LEFT JOIN neardup d ON s.doc_id = d.id_b
  WHERE d.id_b IS NULL)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(w)) AS BIGINT) AS total_tokens
FROM clean GROUP BY lang
"""


@query("q_pipeline_clean", _oracle())
def q_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter (heuristics + the hashed-linear classifier gate)
    → exact-dedup → near-dup-drop → per-lang stats, as one composed
    DataFrame plan."""
    from nutdb_spark.operators.quality_clf import classifier_keep

    d = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    kept = d.filter(
        (F.size(toks) >= _MIN_TOKENS)
        & (stopword_ratio(toks, ENGLISH_STOPWORDS) >= _MIN_STOPWORD)
        & classifier_keep(F.col("text"))
    )
    # the quality+classifier gate (an md5 fold per word) feeds four
    # plan branches (fingerprint agg, semi-join, shingles, final
    # stats); a LAZY localCheckpoint shares ONE materialization across
    # them inside the action. Lazy keeps the build job-free (the
    # lazy-plan pin): `kept` is scan+filter with no exchange, so
    # .rdd materializes no shuffle stage at build time.
    kept = kept.localCheckpoint(eager=False)
    reps = (
        kept.groupBy(fingerprint_md5(F.col("text")).alias("__k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = kept.join(reps, "doc_id", "left_semi")
    pairs = jaccard_pairs(
        surv, "doc_id", "text",
        n=_NGRAM, threshold=_JACCARD_THR, max_shingle_freq=_MAX_FREQ,
    )
    clean = dedup_near_keep_first(pairs, surv, "doc_id")
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text"))).cast("long")).alias(
            "total_tokens"
        ),
    )


# --- end-to-end TRAINING-data pipeline (the round-6 op families) ----------

_T_MIN_TOKENS = 20
_T_MIN_DISTINCT = 0.3
_T_NGRAM = 4
_T_SPLITS = {"train": 0.9, "val": 0.1}
_T_MIX = {"en": 0.5}
_T_BUDGET = 256
_T_SHARDS = 4


def _train_oracle() -> str:
    from nutdb_spark.operators.sampling import (
        oracle_hash_bucket,
        oracle_split_case,
    )
    from nutdb_spark.operators.text import oracle_redact_pii

    rt = oracle_redact_pii("text")
    w = "string_split_regex(trim(rt), '\\s+')"
    sp = oracle_split_case("doc_id", _T_SPLITS)
    mix_b = oracle_hash_bucket("doc_id", salt="mix")
    from nutdb_spark.operators.packing import PACK_GRAIN

    pack_h = oracle_hash_bucket("doc_id", salt="pack", grain=PACK_GRAIN)
    return f"""
WITH base AS (
  SELECT doc_id, lang, {rt} AS rt FROM documents),
tok AS (
  SELECT doc_id, lang, rt, {w} AS w FROM base),
qual AS (
  SELECT * FROM tok
  WHERE len(w) >= {_T_MIN_TOKENS}
    AND len(list_distinct(w)) * 1.0 / len(w) >= {_T_MIN_DISTINCT}),
reps AS (
  SELECT MIN(doc_id) AS doc_id FROM qual
  GROUP BY {oracle_fingerprint_md5('rt')}),
uniq AS (SELECT q.* FROM qual q JOIN reps USING (doc_id)),
sp AS (SELECT u.*, {sp} AS split FROM uniq u),
ev AS (
  SELECT DISTINCT unnest({oracle_shingles('rt', _T_NGRAM)}) AS s
  FROM sp WHERE split = 'val'),
trsh AS (
  SELECT doc_id, unnest({oracle_shingles('rt', _T_NGRAM)}) AS s
  FROM sp WHERE split = 'train'),
bad AS (SELECT DISTINCT t.doc_id FROM trsh t JOIN ev USING (s)),
decon AS (
  SELECT s.* FROM sp s LEFT JOIN bad b USING (doc_id)
  WHERE s.split = 'train' AND b.doc_id IS NULL),
mixed AS (
  SELECT * FROM decon
  WHERE {mix_b} < CASE lang WHEN 'en' THEN 500000 ELSE 1000000 END),
t2 AS (
  SELECT doc_id, lang, len(w) AS n_tokens,
         {pack_h} AS __h,
         CAST(({pack_h}) % {_T_SHARDS} AS INT) AS __shard
  FROM mixed),
c2 AS (
  SELECT doc_id, lang, n_tokens, __shard,
         CAST(SUM(n_tokens) OVER (PARTITION BY __shard
                ORDER BY __h, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
  FROM t2)
SELECT doc_id, lang, n_tokens, __shard AS shard,
       (__cum - n_tokens) // {_T_BUDGET} AS seq,
       (__cum - n_tokens) % {_T_BUDGET} AS "offset"
FROM c2
"""


@query("q_pipeline_train", _train_oracle())
def q_pipeline_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE composed plan: PII
    redaction → repetition-quality filter → exact content dedup →
    deterministic train/val split → eval-set decontamination (drop
    train docs sharing a 4-gram with val) → language rebalancing
    (keep 50% of en) → sequence packing into 256-token streams. Every
    stage is an existing operator (text.redact_pii, sampling
    with_split/sample_stratified, dedup.shingles, packing.
    pack_sequences); the output is each surviving document's exact
    (shard, seq, offset) in the final token layout.

    Scale shape: projections/filters push to the scan; one groupBy for
    the fingerprint; the decontamination side is a broadcast-able
    DISTINCT shingle set streaming through an equi-join; packing adds
    the single shard-key shuffle. Nothing materializes to the driver.
    """
    from nutdb_spark.operators.dedup import shingles
    from nutdb_spark.operators.packing import pack_sequences
    from nutdb_spark.operators.sampling import sample_stratified, with_split
    from nutdb_spark.operators.text import redact_pii

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", redact_pii(F.col("text")).alias("rt")
    )
    toks = tokenize(F.col("rt"))
    qual = base.filter(
        (F.size(toks) >= _T_MIN_TOKENS)
        & (
            F.size(F.array_distinct(toks)) / F.size(toks)
            >= _T_MIN_DISTINCT
        )
    )
    # the PII-redaction projection (a regex chain per row) feeds the
    # fingerprint agg, the semi-join, the split, and both shingle
    # branches; share ONE materialization (lazy: no exchange below, so
    # the build stays job-free — q_pipeline_clean precedent)
    qual = qual.localCheckpoint(eager=False)
    reps = (
        qual.groupBy(fingerprint_md5(F.col("rt")).alias("__k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = qual.join(reps, "doc_id", "left_semi")
    sp = with_split(
        uniq, F.col("doc_id"), fractions=_T_SPLITS, col_name="split"
    )
    sh = sp.select(
        "doc_id", "split", F.explode(shingles(F.col("rt"), _T_NGRAM)).alias("s")
    )
    ev = sh.filter(F.col("split") == "val").select("s").distinct()
    bad = (
        sh.filter(F.col("split") == "train")
        .join(F.broadcast(ev), "s")
        .select("doc_id")
        .distinct()
    )
    decon = sp.filter(F.col("split") == "train").join(
        bad, "doc_id", "left_anti"
    )
    mixed = sample_stratified(
        decon,
        F.col("doc_id"),
        F.col("lang"),
        _T_MIX,
        default=1.0,
        salt="mix",
    )
    packed = pack_sequences(
        mixed.select("doc_id", "lang", F.size(toks).alias("n_tokens")),
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_T_BUDGET,
        shards=_T_SHARDS,
    )
    return packed.select(
        "doc_id", "lang", "n_tokens", "shard", "seq", "offset"
    )


# --- the nightly-ingest pipeline: incremental end to end -------------------


def _incremental_oracle() -> str:
    from nutdb_spark.operators.dedup import oracle_minhash_signature

    sw = oracle_stopword_ratio("w", ENGLISH_STOPWORDS)
    sig = oracle_minhash_signature("text", n=_NGRAM, num_hashes=8)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, sig[{2 * b + 1}] AS k1, "
        f"sig[{2 * b + 2}] AS k2 FROM sigs"
        for b in range(4)
    )
    return f"""
WITH q AS (
  SELECT doc_id, lang, text, {_W} AS w FROM documents),
kept AS (
  SELECT * FROM q
  WHERE len(w) >= {_MIN_TOKENS} AND {sw} >= {_MIN_STOPWORD}),
reps AS (
  SELECT MIN(doc_id) AS doc_id FROM kept
  GROUP BY {oracle_fingerprint_md5('text')}),
surv AS (SELECT k.* FROM kept k JOIN reps USING (doc_id)),
sigs AS (SELECT doc_id, {sig} AS sig FROM surv),
banded AS ({band_rows}),
ok AS (
  SELECT band, k1, k2 FROM banded GROUP BY band, k1, k2
  HAVING COUNT(*) BETWEEN 2 AND 1000),
bk AS (SELECT banded.* FROM banded JOIN ok USING (band, k1, k2)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id),
neardup AS (
  SELECT DISTINCT c.id_b FROM cand c
  JOIN sigs sa ON c.id_a = sa.doc_id
  JOIN sigs sb ON c.id_b = sb.doc_id
  WHERE len(list_filter(list_transform(range(1, 9),
        i -> sa.sig[i] = sb.sig[i]), m -> m)) / 8.0 >= 0.75),
clean AS (
  SELECT s.* FROM surv s LEFT JOIN neardup d ON s.doc_id = d.id_b
  WHERE d.id_b IS NULL)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(w)) AS BIGINT) AS total_tokens
FROM clean GROUP BY lang
"""


@query("q_pipeline_incremental", _incremental_oracle())
def q_pipeline_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NIGHTLY-INGEST pipeline end to end: the corpus arrives as
    two ascending-id batches; each batch is quality-filtered
    (row-local), exact-deduped against the PERSISTED survivors-key
    index, near-deduped against the PERSISTED MinHash band index
    (batch text from earlier ingests is never re-read), and the
    indexes are extended on disk for the next night
    (spark-warehouse/pipe_incr/<sf>/{keys,bands}/ingest=N, overwritten
    per ingest → idempotent). Output per-lang corpus stats must equal
    the ONE-SHOT quality → exact keep-min → LSH keep-first pipeline —
    pinning that the round's incremental operators COMPOSE, not just
    work in isolation.

    Stage order note: exact dedup runs before near-dup (cheaper key
    equi-join shrinks the shingle work), and both replay contracts
    hold through the composition because quality is per-row, exact
    keys are transitive (survivors-only index), and the band index
    keeps every exact-survivor's rows (keep-first pairing needs
    dropped docs too)."""
    import os

    from nutdb_spark.operators.dedup import (
        incremental_exact_dedup,
        incremental_near_dedup,
        minhash_band_rows,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    hi = d.agg(F.max("doc_id")).first()[0]  # bounded collect: one row
    split = (hi + 1) // 2
    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
        "pipe_incr",
        os.path.basename(sf_dir.rstrip("/")) or "dir",
    )
    toks = tokenize(F.col("text"))
    key = fingerprint_md5(F.col("text"))
    kw = dict(n=_NGRAM, num_hashes=8, bands=4, est_threshold=0.75)
    key_index = band_index = None
    out = None
    key_dirs: list = []
    band_dirs: list = []
    # read back ONLY the dirs this run wrote — a bare read of the
    # parent would pick up a previous run's later ingests and wrongly
    # drop the whole next batch as "already indexed"
    from functools import reduce

    for i, batch in (
        (1, d.filter(F.col("doc_id") < split)),
        (2, d.filter(F.col("doc_id") >= split)),
    ):
        q = batch.filter(
            (F.size(toks) >= _MIN_TOKENS)
            & (stopword_ratio(toks, ENGLISH_STOPWORDS) >= _MIN_STOPWORD)
        )
        s1, _keys = incremental_exact_dedup(q, key_index, "doc_id", key)
        # materialize the quality+exact pass ONCE: the key-index
        # write, the shingle pass, and the survivors union all read
        # the checkpointed batch instead of re-running its lineage
        # (the b754d16 band_rows idiom, applied to both stages)
        s1 = s1.localCheckpoint()
        # the survivors' keys, recomputed over the MATERIALIZED rows
        # (md5 is deterministic, so this is the operator's new_keys
        # output without re-running quality+exact for the write)
        keys = s1.select(key.alias("__key")).distinct()
        keys.write.mode("overwrite").parquet(
            os.path.join(base, "keys", f"ingest={i}")
        )
        key_dirs.append(os.path.join(base, "keys", f"ingest={i}"))
        key_index = reduce(
            lambda a, b: a.unionByName(b),
            [spark.read.parquet(p) for p in key_dirs],
        )
        rows = minhash_band_rows(
            s1, "doc_id", "text",
            n=kw["n"], num_hashes=kw["num_hashes"], bands=kw["bands"],
        ).localCheckpoint()
        s2, _ = incremental_near_dedup(
            s1, band_index, "doc_id", "text", band_rows=rows, **kw
        )
        rows.write.mode("overwrite").parquet(
            os.path.join(base, "bands", f"ingest={i}")
        )
        band_dirs.append(os.path.join(base, "bands", f"ingest={i}"))
        band_index = reduce(
            lambda a, b: a.unionByName(b),
            [
                spark.read.parquet(p).select(
                    "__id", "band", "__k0", "__k1", "__sig"
                )
                for p in band_dirs
            ],
        )
        # cut the batch's lineage once: the pair join still re-runs
        # otherwise when the final groupBy unions both batches
        s2 = s2.localCheckpoint()
        out = s2 if out is None else out.unionByName(s2)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text"))).cast("long")).alias(
            "total_tokens"
        ),
    )


_WEB_DEC = """replace(replace(replace(replace(replace(replace({x},
  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
  '&nbsp;', ' '), '&amp;', '&')"""

_WEB_STRIP = """regexp_replace(regexp_replace(regexp_replace(
  regexp_replace({x},
    '(?s)<!--.*?-->', ' ', 'g'),
    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
    '<[^>]*>', ' ', 'g')"""

_WEB_HTML = """'<html><head><script>x &lt; 1</script></head><body><h1>T'
  || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
  || '</p><!-- c --></body></html>'"""


@query(
    "q_pipeline_web",
    (lambda m: f"""
    WITH raw AS (
      SELECT doc_id, {_WEB_HTML} AS html
      FROM documents WHERE doc_id < 600),
    ext AS (
      SELECT doc_id,
        trim(regexp_replace(
          {_WEB_DEC.format(x=_WEB_STRIP.format(x='html'))},
          '\\s+', ' ', 'g')) AS text
      FROM raw),
    scored AS (
      SELECT doc_id, text, {m['n_words']} AS n_words,
             {m['flesch']} AS flesch
      FROM ext),
    kept AS (
      SELECT * FROM scored
      WHERE n_words >= 20 AND flesch IS NOT NULL),
    reps AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS k, min(doc_id) AS doc_id
      FROM kept GROUP BY 1)
    SELECT kept.doc_id AS doc_id, n_words, flesch
    FROM kept JOIN reps ON kept.doc_id = reps.doc_id
    """)(oracle_readability("text")),
)
def q_pipeline_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed web-ingest pipeline — the CommonCrawl shape end to
    end in ONE DataFrame plan: synthetic HTML (built identically on
    both sides) → extractTextFromHTML → readability quality gate
    (n_words ≥ 20, Flesch computable) → exact dedup by normalized-text
    md5 fingerprint keeping the minimum doc id. Every stage is a
    projection or hash-groupBy — no collects, no UDFs; at 100 TB the
    only shuffle is the dedup key."""
    from nutdb_spark.functions.registry import SCALAR_FNS
    from nutdb_spark.operators.text import readability_metrics

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    html = F.concat(
        F.lit("<html><head><script>x &lt; 1</script></head><body><h1>T"),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- c --></body></html>"),
    )
    ext = d.select(
        "doc_id", SCALAR_FNS["extractTextFromHTML"](html).alias("text")
    )
    m = readability_metrics(F.col("text"))
    scored = ext.select(
        "doc_id", "text",
        m["n_words"].alias("n_words"), m["flesch"].alias("flesch"),
    )
    kept = scored.filter(
        (F.col("n_words") >= 20) & F.col("flesch").isNotNull()
    )
    reps = (
        kept.groupBy(fingerprint_md5(F.col("text")).alias("__k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return kept.join(reps, "doc_id", "left_semi").select(
        "doc_id", "n_words", "flesch"
    )


# --- end-to-end TOKENIZE-and-PACK pipeline (the round-12 op families) -------

_PT_BUDGET = 256
_PT_SHARDS = 4


def _tokenize_oracle() -> str:
    from nutdb_spark.operators.bpe import oracle_bpe_token_count_text
    from nutdb_spark.operators.packing import PACK_GRAIN
    from nutdb_spark.operators.quality_clf import oracle_classifier_keep
    from nutdb_spark.operators.sampling import oracle_hash_bucket
    from nutdb_spark.operators.text import oracle_fim

    fim = oracle_fim("doc_id", "text")
    h = oracle_hash_bucket("doc_id", salt="ptok", grain=PACK_GRAIN)
    return f"""
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE {oracle_classifier_keep('text')}),
f AS (
  SELECT doc_id, {fim['fim_applied']} AS fim_applied,
         {fim['out_text']} AS t
  FROM kept),
c AS (
  SELECT doc_id, fim_applied,
         {oracle_bpe_token_count_text('t')} AS n_tokens,
         {h} AS __h,
         CAST(({h}) % {_PT_SHARDS} AS INT) AS __shard
  FROM f),
w AS (
  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY __shard
              ORDER BY __h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
  FROM c)
SELECT doc_id, fim_applied, n_tokens, __shard AS shard,
       (__cum - n_tokens) // {_PT_BUDGET} AS seq,
       (__cum - n_tokens) % {_PT_BUDGET} AS "offset",
       CASE WHEN n_tokens > 0
            THEN (__cum - 1) // {_PT_BUDGET}
                 - (__cum - n_tokens) // {_PT_BUDGET} + 1
            ELSE 0 END AS n_seqs
FROM w ORDER BY doc_id
"""


@query("q_pipeline_tokenize", _tokenize_oracle())
def q_pipeline_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The tokenize-and-pack job a training run actually
    launches, as ONE composed plan from this round's operators:
    hashed-linear classifier gate → fill-in-the-middle rewrite → exact
    BPE token counts (vocabulary-bound distinct-word join over the
    TRANSFORMED text) → deterministic sequence-packing layout. Scale
    shape: gate and FIM are pure projections fused into the scan, the
    BPE stage adds the one vocabulary join, and packing is the single
    shard-partition window — three shuffles end to end for a job that
    tokenizes and lays out a 100 TB corpus."""
    from nutdb_spark.operators.bpe import bpe_token_counts
    from nutdb_spark.operators.packing import pack_sequences
    from nutdb_spark.operators.quality_clf import classifier_keep
    from nutdb_spark.operators.text import fim_transform

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(classifier_keep(F.col("text")))
    fim = fim_transform(F.col("doc_id"), F.col("text"))
    f = kept.select(
        "doc_id",
        fim["fim_applied"].alias("fim_applied"),
        fim["out_text"].alias("t"),
    )
    counts = bpe_token_counts(f, F.col("doc_id"), F.col("t")).select(
        F.col("key").alias("doc_id"),
        F.col("bpe_tokens").alias("n_tokens"),
    )
    base = f.select("doc_id", "fim_applied").join(counts, "doc_id")
    return pack_sequences(
        base,
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_PT_BUDGET,
        shards=_PT_SHARDS,
        salt="ptok",
    ).orderBy("doc_id")


# --- [EXT] round-12 session-3: full curation pipeline ------------------------


def _curate_oracle() -> str:
    from nutdb_spark.operators.bpe import oracle_bpe_token_count_text
    from nutdb_spark.operators.dedup import oracle_dedup_repeated_ngrams
    from nutdb_spark.operators.packing import oracle_epoch_shuffle
    from nutdb_spark.operators.sampling import oracle_dsir_scores
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, oracle_gopher

    gate = oracle_gopher("text", stopwords=ENGLISH_STOPWORDS)["passes"]
    sub = oracle_dedup_repeated_ngrams(k=8, max_freq=1, source="gated")
    dsir = oracle_dsir_scores(
        "lang = 'en'", source="cleaned", text_expr="clean_text"
    )
    sh = oracle_epoch_shuffle("doc_id", epoch=1, shards=4)
    return f"""
WITH gated AS (
  SELECT doc_id, text, lang FROM documents
  WHERE doc_id < 400 AND {gate}),
spans AS ({sub}),
cleaned AS (
  SELECT s.doc_id, g.lang, s.n_removed, s.clean_text
  FROM spans s JOIN gated g USING (doc_id)),
scored AS ({dsir}),
selected AS (
  SELECT c.doc_id, c.lang, c.n_removed, c.clean_text, s.score,
         row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rk
  FROM cleaned c JOIN scored s USING (doc_id))
SELECT doc_id, lang, CAST(n_removed AS BIGINT) AS n_removed,
       CAST(score AS BIGINT) AS score,
       CAST({oracle_bpe_token_count_text('clean_text')} AS BIGINT)
         AS bpe_tokens,
       {sh['eshard']} AS eshard, {sh['pos']} AS pos
FROM selected WHERE rk <= 100 ORDER BY doc_id"""


@query("q_pipeline_curate", _curate_oracle())
def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The session's operators composed end-to-end — the shape a
    100 TB curation job actually runs as ONE DataFrame plan: Gopher
    rule gate → sliding-8-gram exact-substring span removal (corpus
    frequencies computed over the GATED survivors) → DSIR importance
    scoring of the cleaned text (target = labeled-English) → keep the
    top 100 → exact BPE token counts of what survived → epoch-1
    training-order shuffle. Every stage is the already-oracled
    operator; this entry pins that they COMPOSE bit-exactly (the
    oracle chains the same five builders over CTEs). No stage
    materializes to the driver; the top-100 cut is the two-pass
    histogram top-k (global_topk — no corpus-sized single-partition
    sort anywhere in the plan)."""
    from nutdb_spark.operators.bpe import bpe_token_count_text
    from nutdb_spark.operators.dedup import dedup_repeated_ngrams
    from nutdb_spark.operators.packing import epoch_shuffle
    from nutdb_spark.operators.sampling import dsir_scores, global_topk
    from nutdb_spark.operators.text import ENGLISH_STOPWORDS, gopher_rules

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    gated = d.filter(
        gopher_rules(F.col("text"), stopwords=ENGLISH_STOPWORDS)["passes"]
    ).select("doc_id", "text", "lang")
    spans = dedup_repeated_ngrams(gated, "doc_id", "text", k=8, max_freq=1)
    # cleaned fans out to THREE consumers (dsir_scores reads it 3x,
    # the score join once, global_topk's histogram+candidate passes
    # twice) — without a lineage cut the gate + 8-gram span stage
    # re-executes per consumer (guide §5: localCheckpoint when an
    # intermediate is reused and recomputing beats memory pressure).
    # localCheckpoint, not persist: persist would let the session's
    # CacheManager match the identical plan across a bench's
    # best-of-2 runs (cross-run result reuse — exactly what the
    # methodology forbids), while the checkpoint's blocks die with
    # this DataFrame. Eager by necessity: under AQE even a lazy
    # checkpoint finalizes the adaptive plan and runs the shuffle
    # stages, so the entry is a documented exception in the
    # test_plans laziness pin (the q_dedup_semantic precedent); the
    # construction jobs run inside bench.py's timed region either
    # way. Results are the same rows.
    cleaned = (
        spans.join(gated.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_removed", "clean_text")
        .localCheckpoint()
    )
    scored = dsir_scores(
        cleaned, "doc_id", "clean_text", F.col("lang") == "en"
    ).select("doc_id", "score")
    selected = global_topk(
        cleaned.join(scored, "doc_id"),
        F.col("score"),
        F.col("doc_id"),
        100,
    )
    return (
        epoch_shuffle(selected, F.col("doc_id"), epoch=1, shards=4)
        .select(
            "doc_id",
            "lang",
            F.col("n_removed").cast("long").alias("n_removed"),
            F.col("score").cast("long").alias("score"),
            bpe_token_count_text(F.col("clean_text")).alias("bpe_tokens"),
            "eshard",
            F.col("pos").alias("pos"),
        )
        .orderBy("doc_id")
    )


# --- [EXT] round-13 session-3: DENOISING pretraining pipeline ----------------


def _denoise_oracle() -> str:
    from nutdb_spark.operators.bpe import oracle_bpe_token_count_text
    from nutdb_spark.operators.packing import PACK_GRAIN
    from nutdb_spark.operators.sampling import oracle_hash_bucket
    from nutdb_spark.operators.text import (
        ENGLISH_STOPWORDS,
        oracle_gopher,
        oracle_span_corrupt,
    )

    g = oracle_gopher("text", stopwords=ENGLISH_STOPWORDS)
    sc = oracle_span_corrupt(
        "regexp_extract_all(lower(text), '[a-z0-9]+')", "doc_id"
    )
    h = oracle_hash_bucket("doc_id", salt="denoise", grain=PACK_GRAIN)
    stream = "(input_text || ' ' || target_text)"
    return f"""
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < 400 AND ({g['passes']})),
f AS (
  SELECT doc_id, {sc['n_masked']} AS n_masked,
         {sc['input_text']} AS input_text,
         {sc['target_text']} AS target_text
  FROM kept),
c AS (
  SELECT doc_id, n_masked,
         {oracle_bpe_token_count_text(stream)} AS n_tokens,
         {h} AS __h,
         CAST(({h}) % {_PT_SHARDS} AS INT) AS __shard
  FROM f),
w AS (
  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY __shard
              ORDER BY __h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS __cum
  FROM c)
SELECT doc_id, n_masked, n_tokens, __shard AS shard,
       (__cum - n_tokens) // {_PT_BUDGET} AS seq,
       (__cum - n_tokens) % {_PT_BUDGET} AS "offset",
       CASE WHEN n_tokens > 0
            THEN (__cum - 1) // {_PT_BUDGET}
                 - (__cum - n_tokens) // {_PT_BUDGET} + 1
            ELSE 0 END AS n_seqs
FROM w ORDER BY doc_id
"""


@query("q_pipeline_denoise", _denoise_oracle())
def q_pipeline_denoise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The DENOISING-objective data job (the T5 counterpart of
    q_pipeline_tokenize's causal-LM job) as ONE composed plan: Gopher
    quality gate → deterministic span corruption → exact BPE token
    count of the FULL trainable stream (corrupted input + sentinel
    targets — what actually fills the context window) → deterministic
    sequence-packing layout. Gate and corruption are pure projections
    fused into the scan, the BPE stage adds the one vocabulary-bound
    distinct-word join, packing is the single shard-partition window
    — the same three-shuffle shape as the tokenize pipeline, now for
    an encoder-decoder / denoising corpus. Corpus is doc_id-slice
    bounded (the composed-pipeline suite convention — q_pipeline_curate
    precedent): the stages' corpus-scaling costs are recorded
    UNSLICED by their own entries (q_text_span_corrupt, q_text_bpe),
    so the slice keeps the composition's bench reading a composition
    reading."""
    from nutdb_spark.operators.bpe import bpe_token_counts
    from nutdb_spark.operators.packing import pack_sequences
    from nutdb_spark.operators.text import (
        ENGLISH_STOPWORDS,
        gopher_rules,
        span_corrupt_cols,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    kept = d.filter(
        gopher_rules(F.col("text"), stopwords=ENGLISH_STOPWORDS)["passes"]
    )
    words = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
    )
    sc = span_corrupt_cols(words, F.col("doc_id"))
    f = kept.select(
        "doc_id",
        sc["n_masked"].alias("n_masked"),
        F.concat(
            sc["input_text"], F.lit(" "), sc["target_text"]
        ).alias("__stream"),
    )
    counts = bpe_token_counts(f, F.col("doc_id"), F.col("__stream")).select(
        F.col("key").alias("doc_id"),
        F.col("bpe_tokens").alias("n_tokens"),
    )
    base = f.select("doc_id", "n_masked").join(counts, "doc_id")
    return pack_sequences(
        base,
        F.col("doc_id"),
        F.col("n_tokens"),
        budget=_PT_BUDGET,
        shards=_PT_SHARDS,
        salt="denoise",
    ).orderBy("doc_id")
