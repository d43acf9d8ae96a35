"""[EXT] Deterministic sampling & dataset splits for training pipelines.

Training-data pipelines need samples and train/val/test splits that are
REPRODUCIBLE — across engines, re-runs, partitionings, and appends
(a late-arriving row must land in the same split it would have landed
in on day one). Random number generators give none of that; the
standard technique is hash-based assignment: a row's fate is a pure
function of its stable key.

Everything here keys off md5 (salted), available bit-identically in
Spark, DuckDB, and Python: the first 15 hex digits (60 bits) are parsed
to an int64 and reduced mod a granularity. No shuffle, no state, no
RNG — a pure projection that scales like the scan and composes with
every other operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAIN = 1_000_000  # split granularity: ppm resolution


def hash_bucket(key: Column, salt: str = "", grain: int = GRAIN) -> Column:
    """Deterministic bucket in [0, grain): md5(salt || key) first 60
    bits mod grain. The salt decouples independent samples — two
    samples with different salts are statistically independent even on
    the same keys."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % grain


def oracle_hash_bucket(key_expr: str, salt: str = "", grain: int = GRAIN) -> str:
    return (
        f"CAST('0x' || substring(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {grain}"
    )


def sample_fraction(
    df: DataFrame, key: Column, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, deterministically: a row is kept iff
    its hash bucket < fraction·grain. Append-stable and engine-portable
    (unlike df.sample, whose output depends on partition layout)."""
    return df.filter(hash_bucket(key, salt) < int(fraction * GRAIN))


def with_split(
    df: DataFrame,
    key: Column,
    *,
    fractions: dict[str, float],
    salt: str = "split",
    col_name: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test…) by hash
    range. Fractions must sum to ≤ 1; any remainder becomes NULL (rows
    held out entirely). Assignment is per-row pure — appends, re-runs,
    and engine changes never move a row between splits."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(key, salt)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(frac * GRAIN)
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(col_name, expr)


def oracle_split_case(
    key_expr: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> str:
    b = oracle_hash_bucket(key_expr, salt)
    parts = []
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(frac * GRAIN)
        parts.append(f"WHEN ({b}) >= {lo} AND ({b}) < {hi} THEN '{name}'")
        lo = hi
    return "CASE " + " ".join(parts) + " END"


def sample_stratified(
    df: DataFrame,
    key: Column,
    stratum: Column,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing
    primitive (keep 100% of a rare language, 5% of the dominant one).
    Same hash-threshold mechanics as :func:`sample_fraction`, but the
    threshold is selected per row by the stratum value (strata not
    listed get ``default``). Still a pure projection: no shuffle, no
    state, append-stable, and a row's fate never depends on the other
    rows in its stratum."""
    b = hash_bucket(key, salt)
    thr = None
    for name, frac in fractions.items():
        c = int(frac * GRAIN)
        thr = (
            F.when(stratum == name, c)
            if thr is None
            else thr.when(stratum == name, c)
        )
    thr = thr.otherwise(int(default * GRAIN)) if thr is not None else F.lit(
        int(default * GRAIN)
    )
    return df.filter(b < thr)


def oracle_stratified_threshold(
    stratum_expr: str, fractions: dict[str, float], default: float = 0.0
) -> str:
    parts = [
        f"WHEN {stratum_expr} = '{name}' THEN {int(frac * GRAIN)}"
        for name, frac in fractions.items()
    ]
    return (
        "CASE " + " ".join(parts) + f" ELSE {int(default * GRAIN)} END"
    )


def sample_temperature(
    df: DataFrame,
    key: Column,
    domain: Column,
    salt: str = "",
    grain: int = GRAIN,
) -> DataFrame:
    """Temperature-based domain rebalancing at α = 0.5 (the UL2/PaLM
    mixing idiom): sampling rate r_d = sqrt(c_min / c_d), so the rarest
    domain keeps everything and a domain 100× larger keeps 10% — the
    square-root flattening of the domain distribution.

    α is pinned to 0.5 deliberately: sqrt and the preceding division
    are EXACTLY rounded under IEEE 754 in every engine, so the
    per-domain integer threshold floor(grain·sqrt(c_min/c_d)) is
    bit-identical cross-engine — a generic pow(p, α-1) is not exactly
    specified and could flip boundary rows between engines.

    Scale shape: one count aggregate over the domain column (tiny
    result, one row per domain), broadcast back — the document side
    never shuffles; membership is then the same pure hash-threshold
    projection as every other sampler here (partition-independent;
    append-stable once the per-domain thresholds are frozen —
    recounting a grown corpus legitimately moves them).
    """
    dom = domain.alias("__dom")
    counts = df.select(dom).groupBy("__dom").agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    rates = counts.join(F.broadcast(cmin)).select(
        "__dom",
        F.floor(
            F.lit(grain)
            * F.sqrt(F.col("__cmin").cast("double") / F.col("__c").cast("double"))
        ).alias("__thr"),
    )
    joined = df.join(F.broadcast(rates), domain == F.col("__dom"))
    return joined.filter(hash_bucket(key, salt, grain) < F.col("__thr")).drop(
        "__dom", "__thr"
    )


def sample_quota(
    df: DataFrame,
    key: Column,
    stratum: Column,
    quota: int,
    salt: str = "",
) -> DataFrame:
    """EXACT per-stratum quota: keep the ``quota`` lowest hash-ranked
    rows of every stratum — min(quota, |stratum|) rows GUARANTEED,
    the eval-set construction primitive (vs the fraction samplers'
    probabilistic keep, which under- or over-shoots small strata).

    Deterministic (md5 bucket, ties broken by the key itself) and
    deliberately append-UNSTABLE: a newly ingested lower-hash row
    legitimately displaces the highest kept one — a fixed-size quota
    cannot be append-stable and exact at once; pick
    :func:`sample_stratified` when stability matters more than size.

    Scale shape: ONE shuffle on the stratum for the window rank; no
    global sort, no driver state. Skewed strata are bounded by the
    per-partition top-k AQE applies to rank-filter windows."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum).orderBy(hash_bucket(key, salt), key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def oracle_quota(
    key_expr: str, stratum_expr: str, quota: int, salt: str = ""
) -> str:
    """DuckDB mirror of :func:`sample_quota`'s membership rank."""
    b = oracle_hash_bucket(key_expr, salt)
    return (
        f"row_number() OVER (PARTITION BY {stratum_expr} "
        f"ORDER BY {b}, {key_expr}) <= {quota}"
    )


def kfold(
    df: DataFrame,
    key: Column,
    k: int,
    *,
    salt: str = "kfold",
    col_name: str = "fold",
) -> DataFrame:
    """K-fold cross-validation assignment: fold = hash_bucket % k —
    a pure projection with every reproducibility property of
    :func:`with_split` (append-stable, partition-independent,
    engine-portable). Fold f's validation set is `fold == f`; its
    training set is everything else. At scale the training sets are
    NEVER materialized k times — assign once, filter per fold (the
    complement is derivable, which the suite entry demonstrates by
    computing train sizes as total − fold size without a k× scan)."""
    if k < 2:
        raise ValueError(f"k-fold needs k >= 2, got {k}")
    return df.withColumn(
        col_name, (hash_bucket(key, salt) % k).cast("long")
    )


def oracle_kfold(key_expr: str, k: int, salt: str = "kfold") -> str:
    return f"(({oracle_hash_bucket(key_expr, salt)}) % {k})"


# --- [EXT] DSIR hashed importance resampling ---------------------------------

DSIR_DIM = 4096  # hashed feature buckets
DSIR_SCALE = 1_000_000  # fixed-point scale for the per-feature ratio


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    *,
    dim: int = DSIR_DIM,
    salt: str = "dsir",
) -> DataFrame:
    """[EXT] DSIR-style data selection via hashed n-gram importance
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): features are unigrams + bigrams hashed
    into ``dim`` buckets; a document's importance is how much more its
    features look like the ``target`` subset than the raw corpus.

    Exact-arithmetic stand-in for the paper's log-likelihood-ratio sum
    (the engine's oracle convention — a libm log never hash-oracles):
    per feature, the add-one-smoothed target/raw count ratio in fixed
    point, ``r_f = ((cnt_tgt_f + 1) · 10^6) div (cnt_raw_f + 1)``, and
    the document score is the sum of ``r_f`` over its feature
    OCCURRENCES (the same bag-of-words weighting; the ratio-sum is the
    same keep-the-target-like-documents signal, and every comparison
    downstream is on exact int64). ``r_f`` stays in int64 up to
    ~9·10^12 target occurrences of one bucket.

    Scale shape: explode → one hash-groupBy over ``dim``-bounded
    feature buckets (the count table is dim-sized — broadcastable at
    any corpus size, unlike a raw vocabulary) → equi-join back →
    per-doc sum. The global totals never enter: constant factors
    cancel in ranking, which is what keeps every term int64.

    Returns (doc_id, n_feats, score); downstream selection ranks by
    (score DESC, doc_id). Empty docs surface with score 0.
    """
    from nutdb_spark.operators.text import ngrams, normalize_text, tokenize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        target.cast("int").alias("__tgt"),
        F.filter(
            tokenize(normalize_text(F.col(text_col))),
            lambda t: F.length(t) > 0,
        ).alias("__w"),
    )
    feats = base.select(
        "doc_id",
        "__tgt",
        F.explode(
            F.concat(F.col("__w"), ngrams(F.col("__w"), 2))
        ).alias("__feat"),
    ).select(
        "doc_id",
        "__tgt",
        hash_bucket(F.col("__feat"), salt=salt, grain=dim).alias("f"),
    )
    cnt = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.sum("__tgt").alias("cnt_tgt"),
    )
    ratio = cnt.select(
        "f",
        F.expr(
            f"((cnt_tgt + 1) * {DSIR_SCALE}) div (cnt_raw + 1)"
        ).alias("r"),
    )
    per = (
        feats.join(ratio, "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("r").alias("score"),
        )
    )
    return (
        base.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias(
                "n_feats"
            ),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
        )
    )


def oracle_dsir_scores(
    target_expr: str,
    *,
    dim: int = DSIR_DIM,
    salt: str = "dsir",
    where: str = "TRUE",
    source: str = "documents",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of dsir_scores over ``source`` (full SELECT
    yielding doc_id, n_feats, score; compose with an outer query)."""
    from nutdb_spark.operators.text import (
        oracle_ngrams,
        oracle_normalize,
        oracle_tokenize,
    )

    words = (
        f"list_filter({oracle_tokenize(oracle_normalize(text_expr))}, "
        "t -> length(t) > 0)"
    )
    return f"""
WITH base AS (
  SELECT doc_id, CAST({target_expr} AS INT) AS tgt, {words} AS w
  FROM {source} WHERE {where}),
feats AS (
  SELECT doc_id, tgt,
         {oracle_hash_bucket("feat", salt=salt, grain=dim)} AS f
  FROM (SELECT doc_id, tgt,
               unnest(list_concat(w, {oracle_ngrams('w', 2)})) AS feat
        FROM base)),
cnt AS (
  SELECT f, count(*) AS cnt_raw, sum(tgt) AS cnt_tgt
  FROM feats GROUP BY f),
ratio AS (
  SELECT f, ((cnt_tgt + 1) * {DSIR_SCALE}) // (cnt_raw + 1) AS r
  FROM cnt),
per AS (
  SELECT doc_id, count(*) AS n_feats, sum(r) AS score
  FROM feats JOIN ratio USING (f) GROUP BY doc_id)
SELECT b.doc_id,
       CAST(coalesce(p.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(coalesce(p.score, 0) AS BIGINT) AS score
FROM base b LEFT JOIN per p USING (doc_id)"""


def global_topk(
    df: DataFrame,
    score: Column,
    key: Column,
    k: int,
    *,
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """[EXT] Exact global top-``k`` by (score DESC, key ASC) WITHOUT a
    corpus-sized single-partition sort — the two-pass histogram cut
    the selection entries' docstrings promise at 100 TB, implemented:

    1. histogram: rows bucket by ``score div bucket_width`` and one
       hash-groupBy counts each bucket (distributed, map-side
       partial),
    2. a cumulative count over the DESC-ordered bucket table finds
       the boundary bucket — the one global window in the plan runs
       over the bucket table (≤ score-range/width rows, a knob), and
       at most ``k`` buckets survive it (each kept bucket has < k
       rows above it, and every bucket holds ≥ 1 row),
    3. candidate rows semi-join the ≤ k kept buckets (broadcast —
       provably bounded); candidates number at most k plus the
       boundary bucket's population,
    4. the exact (score DESC, key ASC) rank over the candidates is
       itself DISTRIBUTED: range-partition on the composite order,
       local ``row_number`` per range partition, plus per-partition
       row-count offsets (a ≤ shuffle-partitions-row frame, so its
       cumulative window is trivially bounded). Because ``key``
       participates in the range partitioning, even the degenerate
       case where every score lands in ONE histogram bucket
       (constant or narrow-range scores — where the candidate set is
       the whole corpus) spreads across partitions instead of
       funnelling through a single-partition sort.

    The output ``rk`` is bit-identical to ``row_number() OVER (ORDER
    BY score DESC, key) ≤ k`` — which is what lets the DuckDB oracle
    stay the naive window while the Spark plan never funnels the
    corpus through one partition. Ties across bucket edges are safe:
    bucketing is monotone in score, and the exact rank re-orders
    within the candidate set.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    from pyspark.sql import Window

    tagged = df.withColumn("__score", score).withColumn("__key", key)
    # floor-div via `div` keeps negatives exact (Spark div truncates
    # toward zero, so shift scores non-negative per-plan is avoided by
    # bucketing on the raw integral quotient — monotone either way for
    # a fixed sign regime; cumulative order uses the bucket value)
    tagged = tagged.withColumn(
        "__b", F.expr(f"__score div {bucket_width}")
    )
    hist = tagged.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_cum = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept_buckets = (
        hist.withColumn("__cum", F.sum("__n").over(w_cum))
        .withColumn("__above", F.col("__cum") - F.col("__n"))
        .filter(F.col("__above") < k)
        .select("__b")
    )
    cand = tagged.join(F.broadcast(kept_buckets), "__b")
    # Distributed exact rank (stage 4 of the docstring). The two
    # consumers of `srt` (local ranks and per-partition counts) share
    # the one range-shuffle via Spark's exchange reuse, so both see
    # the same sampled partition boundaries; the rank VALUES are
    # boundary-independent either way (contiguous ranges + local
    # offsets reconstruct the total order for any boundary choice).
    srt = cand.repartitionByRange(
        F.col("__score").desc(), F.col("__key").asc()
    ).withColumn("__pid", F.spark_partition_id())
    w_loc = Window.partitionBy("__pid").orderBy(
        F.col("__score").desc(), F.col("__key").asc()
    )
    loc = srt.withColumn("__lrk", F.row_number().over(w_loc))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        srt.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__pn"))
        .withColumn("__off", F.sum("__pn").over(w_off) - F.col("__pn"))
        .select("__pid", "__off")
    )
    return (
        loc.join(F.broadcast(offsets), "__pid")
        .withColumn("rk", (F.col("__off") + F.col("__lrk")).cast("long"))
        .filter(F.col("rk") <= k)
        .drop("__score", "__key", "__b", "__pid", "__lrk", "__off")
    )


def dsir_ratio_table(
    df: DataFrame,
    text_col: str,
    target: Column,
    *,
    dim: int = DSIR_DIM,
    salt: str = "dsir",
) -> DataFrame:
    """The trainable half of DSIR split out: the per-bucket
    fixed-point importance ratios (f, r) over a REFERENCE corpus —
    freeze it once, then score any stream against it (the train/apply
    split a production selection stage actually runs; re-deriving
    ratios per batch would make every document's score drift as the
    corpus grows). dim-bounded: always broadcastable."""
    from nutdb_spark.operators.text import ngrams, normalize_text, tokenize

    base = df.select(
        target.cast("int").alias("__tgt"),
        F.filter(
            tokenize(normalize_text(F.col(text_col))),
            lambda t: F.length(t) > 0,
        ).alias("__w"),
    )
    feats = base.select(
        "__tgt",
        F.explode(
            F.concat(F.col("__w"), ngrams(F.col("__w"), 2))
        ).alias("__feat"),
    ).select(
        "__tgt", hash_bucket(F.col("__feat"), salt=salt, grain=dim).alias("f")
    )
    return (
        feats.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("cnt_raw"),
            F.sum("__tgt").alias("cnt_tgt"),
        )
        .select(
            "f",
            F.expr(
                f"((cnt_tgt + 1) * {DSIR_SCALE}) div (cnt_raw + 1)"
            ).alias("r"),
        )
    )


def dsir_score_against(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ratios: DataFrame,
    *,
    dim: int = DSIR_DIM,
    salt: str = "dsir",
) -> DataFrame:
    """Score documents against a FROZEN ratio table: per feature
    occurrence, the stored ratio — or the add-one-smoothed
    unseen-bucket value ``(0+1)·SCALE div (0+1) = SCALE`` for buckets
    the reference corpus never produced (so unseen vocabulary reads
    as neutral, not as an error). The ratio frame broadcasts
    (dim-bounded); the plan is explode → broadcast join → per-doc
    sum — stateless per batch, which is what makes it a streaming
    scorer."""
    from nutdb_spark.operators.text import ngrams, normalize_text, tokenize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokenize(normalize_text(F.col(text_col))),
            lambda t: F.length(t) > 0,
        ).alias("__w"),
    )
    feats = base.select(
        "doc_id",
        F.explode(
            F.concat(F.col("__w"), ngrams(F.col("__w"), 2))
        ).alias("__feat"),
    ).select(
        "doc_id", hash_bucket(F.col("__feat"), salt=salt, grain=dim).alias("f")
    )
    per = (
        feats.join(F.broadcast(ratios), "f", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("r"), F.lit(DSIR_SCALE))).alias("score"),
        )
    )
    return (
        base.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias(
                "n_feats"
            ),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
        )
    )
