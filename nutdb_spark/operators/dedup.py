"""[EXT] Deduplication operators for LLM training-data pipelines.

Exact dedup is a hash-groupBy (map-side partial dedup, one shuffle on
the key). Near-dup goes through shingling → either exact Jaccard via an
inverted-index pair join, or MinHash signatures + LSH banding — in both
cases candidate pairs come from equi-joins on shared shingles/bands,
NEVER an all-pairs crossJoin, so cost scales with collision counts, not
n². Hashing is md5-based (hex-string minima), bit-identical across
engines and across cluster re-runs.

Architecture note: everything downstream of the shingle computation is
ROW-relational (explode → aggregate → join), not nested-array
expressions. Spark re-evaluates an outer-scope array reference inside
every higher-order-function lambda element, so an 8-seed MinHash
written as 8 array transforms recomputes the whole shingle pipeline 8×
(measured 7× slower at sf0.1); the explode form evaluates shingles once
per document and turns the seeds into 8 ordinary min() aggregates —
which is also exactly the shape that scales on a cluster.

Scale notes (100 TB): the inverted-index join's fan-out is bounded by
dropping ultra-common shingles (``max_shingle_freq``) — the classic
stopword-shingle blowup guard; MinHash+LSH is the constant-cost path
(signature size × bands), which is why both are provided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutdb_spark.operators.text import ngrams, oracle_ngrams, tokenize


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """dedupExact: one representative row per key set (hash-groupBy)."""
    return df.dropDuplicates(list(keys))


def dedup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Dedup audit: per content-key group → representative (min id) +
    multiplicity. `key` is any deterministic Column (e.g. md5 of
    normalized text)."""
    return df.groupBy(key.alias("dup_key")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingles(text_col: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingle set of a document."""
    return F.array_distinct(ngrams(tokenize(text_col), n))


def oracle_shingles(text_expr: str, n: int = 2) -> str:
    words = f"string_split_regex(trim({text_expr}), '\\s+')"
    return f"list_distinct({oracle_ngrams(words, n)})"


# Java String.trim strips every char <= U+0020; the Python shingle
# generator mirrors it (plus ASCII-\s+ splitting, matching both Java
# regex \s and DuckDB RE2 \s) so all three engines tokenize alike.
_JAVA_TRIM = "".join(chr(c) for c in range(0x21))

# MinHash universal-hash family over the Mersenne prime 2^31-1: each
# shingle is md5-hashed ONCE (base = first 60 bits of the digest mod P)
# and the k signature slots are affine variants (a_i*base + b_i) mod P
# — the textbook construction, 8× less hashing than k seeded md5 runs.
# All arithmetic stays far inside int64 (a_i*P + b_i < 2^36), so
# Python, Spark, and DuckDB compute identical values.
MINHASH_P = 2_147_483_647


def _affine(i: int) -> tuple[int, int]:
    return 2 * i + 1, 7919 * i + 13


def _doc_shingle_set(text, n: int, split) -> set:
    toks = split(text.strip(_JAVA_TRIM)) if text is not None else []
    return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}


def _widen(df: DataFrame) -> DataFrame:
    """Parallelism guard for Python stages: a small corpus can arrive
    as fewer input splits than cores (sf0.1 = one parquet file = one
    task), serializing mapInPandas. At real scale the input dwarfs the
    threshold and this is a no-op — no shuffle added.

    The probe is the optimizer's sizeInBytes estimate — driver-side
    metadata only. (`df.rdd.getNumPartitions()` looks tempting but is
    NOT lazy under AQE: converting a shuffle-bearing plan to an RDD
    materializes its query stages, firing jobs at lowering time — the
    laziness test caught exactly that when a joined frame was passed
    here.)"""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(
            str(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        )
    except Exception:  # noqa: BLE001 — stats unavailable: leave plan alone
        return df
    if size >= 256 * 1024 * 1024:
        # Large input: parquet is splittable, so the scan already fans
        # out by spark.sql.files.maxPartitionBytes — no shuffle needed.
        return df
    try:
        # inputFiles() is driver-side metadata (lazy — no job). A small
        # frame already backed by >= par files is at full parallelism;
        # adding a repartition would be a pure extra shuffle.
        if len(df.inputFiles()) >= par:
            return df
    except Exception:  # noqa: BLE001 — non-file-backed plan: fall through
        pass
    return df.repartition(par)


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(__id, __s, __n) rows: distinct word-n-gram shingles per doc
    plus the doc's distinct-shingle count.

    One Arrow-batched pass (mapInPandas): trim → ASCII-whitespace
    split → n-gram set per document. Zero shuffles — the window/
    distinct formulation costs a shuffle for the window sort and
    another for the distinct, and a separate per-doc size aggregate
    costs a third; carrying ``__n`` on every row makes the sizes
    branch (and its recomputation of this whole pipeline) disappear.
    Downstream consumers that self-join get identical child plans, so
    Spark reuses one shuffle for both sides (ReusedExchange).

    Tokenization is byte-compatible with `operators.text.tokenize`
    (Java trim + ASCII \\s+ split) and with the DuckDB oracle's
    ``string_split_regex(trim(text), '\\s+')``: docs with fewer than
    n tokens produce no rows."""
    import re

    import pandas as pd

    split = re.compile(r"[ \t\n\x0b\f\r]+").split

    def gen(batches):
        for pdf in batches:
            ids, ss, ns = [], [], []
            for i, text in zip(pdf["__id"], pdf["__t"]):
                sh = _doc_shingle_set(text, n, split)
                for s in sh:
                    ids.append(i)
                    ss.append(s)
                    ns.append(len(sh))
            yield pd.DataFrame({"__id": ids, "__s": ss, "__n": ns})

    src = _widen(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    )
    return src.mapInPandas(gen, "__id long, __s string, __n long")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index.

    ``max_shingle_freq`` (default None = exact semantics) drops
    shingles present in more documents than that before the self-join —
    set it for any corpus-scale run. Without it one
    stop-phrase shingle shared by 10^6 docs makes the join quadratic;
    with it the per-shingle fan-out is bounded by freq² — the guard
    that keeps this plan viable at 100 TB. Dropping a hot shingle only
    removes candidate pairs whose ONLY overlap is boilerplate (set
    sizes stay the full sizes, so surviving pairs' Jaccard is computed
    against their true denominators, slightly underestimating shared
    counts for pairs that also share a hot shingle — the standard
    stop-shingle approximation).

    shingle rows (each carrying its doc's set size) → self-equi-join
    on the shingle (inverted index: only pairs sharing ≥1 shingle) →
    per-pair shared count → Jaccard from the carried set sizes.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    The division is bigint/bigint→double, deterministic cross-engine.

    Plan shape: the shingle pipeline is evaluated once per join side
    and nowhere else — carrying ``__n`` on every row eliminates the
    separate per-doc sizes branch (a third full evaluation) and its
    two extra joins. A posting-list + double-explode formulation was
    measured 3× slower here: each exploded row re-carries the whole
    posting array, so hot shingles turn into O(k²·k) bytes of
    intermediate state instead of the join's O(k²) rows.
    """
    ex = shingle_rows(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__f"))
        ex = (
            ex.join(freq, "__s")
            .filter(F.col("__f") <= max_shingle_freq)
            .drop("__f")
        )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    jac = F.col("__shared") / (F.col("__na") + F.col("__nb") - F.col("__shared"))
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 8,
    keep_empty: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature: one row per doc with bigint columns
    __h0..__h{k-1}, computed in a single Arrow pass — per shingle, ONE
    md5 (base hash), then k affine variants (a_i*base+b_i) mod P with
    a running min per slot (see MINHASH_P).

    Docs with fewer than n tokens have no shingles → null signature
    components (restored via left join on the id set; pass
    ``keep_empty=False`` to drop them and skip that join)."""
    import re
    from hashlib import md5 as _md5

    import pandas as pd

    split = re.compile(r"[ \t\n\x0b\f\r]+").split
    coeffs = [_affine(i) for i in range(num_hashes)]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i, text in zip(pdf["__id"], pdf["__t"]):
                sh = _doc_shingle_set(text, n, split)
                if not sh:
                    continue
                mins = [MINHASH_P + 1] * num_hashes
                for s in sh:
                    base = (
                        int(_md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                    )
                    for k, (a, b) in enumerate(coeffs):
                        h = (a * base + b) % MINHASH_P
                        if h < mins[k]:
                            mins[k] = h
                rows.append((i, *mins))
            yield pd.DataFrame(
                rows, columns=["__id"] + [f"__h{k}" for k in range(num_hashes)]
            )

    src = _widen(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    )
    schema = ", ".join(
        ["__id long"] + [f"__h{k} long" for k in range(num_hashes)]
    )
    sig = src.mapInPandas(gen, schema)
    if not keep_empty:
        return sig
    ids = df.select(F.col(id_col).alias("__id"))
    return ids.join(sig, "__id", "left")


def oracle_minhash_signature(text_expr: str, *, n: int = 2, num_hashes: int = 8) -> str:
    """DuckDB twin of `minhash_signature_df`: same base-hash (first 60
    digest bits via '0x…' cast) and affine family."""
    sh = oracle_shingles(text_expr, n)
    mins = []
    for i in range(num_hashes):
        a, b = _affine(i)
        mins.append(
            f"list_aggregate(list_transform({sh}, s -> "
            f"({a} * (CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) "
            f"% {MINHASH_P}) + {b}) % {MINHASH_P}), 'min')"
        )
    return "[" + ", ".join(mins) + "]"


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
    est_threshold: float = 0.75,
    max_bucket: int = 1000,
) -> DataFrame:
    """dedupNear: MinHash + LSH banding candidate generation.

    Signature split into `bands` bands of r = num_hashes/bands rows;
    rows sharing a band's slot values are grouped into a posting list
    (groupBy the band struct + collect_list), candidates come from the
    per-bucket pair expansion (double explode), and verification is
    the estimated Jaccard (matching signature fraction) ≥
    est_threshold. Three shuffles (bucket sizes, bucket lists, pair
    dedup); equi-joins only — no crossJoin — at any scale.

    Hot-bucket guard (``max_bucket``): a web-scale corpus full of
    boilerplate near-duplicates can put millions of docs in ONE band
    bucket — a single-row OOM at collect_list and a quadratic pair
    explosion after it. Bucket sizes are therefore counted FIRST
    (map-side-partial count, no lists) and rows in buckets larger than
    the cap are cut before any posting list materializes, mirroring the
    ``max_shingle_freq`` guard on the exact-Jaccard path: a bucket that
    hot is degenerate boilerplate, and its members still pair up
    through their other, more selective bands.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature_df(
        df, id_col, text_col, n=n, num_hashes=num_hashes, keep_empty=False
    )
    banded = sig.select(
        "__id",
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("__sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col(f"__h{b * r + j}").alias(f"k{j}")
                            for j in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band"),
    )
    ok = (
        banded.groupBy("__band")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") >= 2) & (F.col("__bn") <= max_bucket))
        .select("__band")
    )
    buckets = banded.join(ok, "__band").groupBy("__band").agg(
        F.collect_list(F.struct("__id", "__sig")).alias("__ds")
    )
    matches = F.size(
        F.filter(
            F.zip_with(
                F.col("__a.__sig"), F.col("__b.__sig"), lambda x, y: x == y
            ),
            lambda m: m,
        )
    )
    est = matches / F.lit(float(num_hashes))
    return (
        buckets.filter(F.size("__ds") >= 2)
        .select(F.explode("__ds").alias("__a"), "__ds")
        .select("__a", F.explode("__ds").alias("__b"))
        .filter(F.col("__a.__id") < F.col("__b.__id"))
        .select(
            F.col("__a.__id").alias("id_a"),
            F.col("__b.__id").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= est_threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_near_keep_first(
    pairs: DataFrame, df: DataFrame, id_col: str
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair (connected
    components approximated by one sweep — the standard single-pass
    policy for pipeline dedup). Under-merges chains (A~B~C keeps A and
    C); :func:`dedup_connected_keep_min` is the exact-transitive
    variant."""
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


# --- incremental corpus-delta dedup ----------------------------------------


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The persistable MinHash band index: one row per (doc, band) with
    the band's slot values as SCALAR key columns (__k0..__k{r-1}) plus
    the full signature array — the exact join surface
    :func:`incremental_near_dedup` probes a delta batch against.

    Scalar key columns (not a struct) so the index persists as a plain
    parquet table whose band-key join is a vanilla multi-column
    equi-join with min/max statistics — bucket/sort the stored table by
    (band, __k0, ...) and delta probes become co-located lookups.
    Empty docs (no shingles) contribute no rows, matching
    ``minhash_lsh_pairs(keep_empty=False)``.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature_df(
        df, id_col, text_col, n=n, num_hashes=num_hashes, keep_empty=False
    )
    return sig.select(
        "__id",
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias(
            "__sig"
        ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col(f"__h{b * r + j}").alias(f"__k{j}")
                            for j in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band"),
    ).select("__id", "__band.*", "__sig")


def incremental_near_dedup(
    delta: DataFrame,
    index: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
    est_threshold: float = 0.75,
    max_bucket: int = 1000,
    band_rows: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against the EXISTING corpus without rescanning
    the corpus text — the nightly-ingest pattern at 100 TB. Returns
    ``(survivors, band_rows)``: the delta rows that survive, and the
    delta's band rows to APPEND to the index table for the next batch.

    ``index`` is the accumulated :func:`minhash_band_rows` output for
    every previously ingested batch (None for the first batch). A delta
    doc is dropped when its estimated Jaccard (matching signature
    fraction) ≥ ``est_threshold`` against ANY indexed doc, or against a
    lower-id doc of the same delta. Both candidate generators are
    banded equi-joins — the corpus text is never re-shingled, only its
    O(bands) index rows are joined.

    Replay contract (pinned in tests/test_incremental_dedup.py):
    ingesting batches in ascending-id order and unioning the survivors
    is row-identical to one-shot
    ``dedup_near_keep_first(minhash_lsh_pairs(corpus))``. Two design
    points follow from that contract:

    - the index keeps band rows for ALL delta docs, dropped ones too.
      One-shot keep-first drops the higher id of every pair, including
      pairs whose lower member was itself dropped (A~B, B~C, no A~C
      drops both B and C) — a survivors-only index would let C back in.
      It is also the production-correct choice: a new doc that
      near-duplicates an already-dropped doc is still a member of that
      doc's retained cluster.
    - ascending-id batches make "any corpus match drops the delta doc"
      coincide with keep-first-by-id (every indexed id is lower).

    Scale notes: the hot-bucket guard counts bucket population across
    index ∪ delta FIRST (map-side partial count) and cuts band keys
    with more than ``max_bucket`` members before any pair expansion —
    the same boilerplate-bucket blowup guard as
    :func:`minhash_lsh_pairs`, now also protecting against a degenerate
    bucket that accumulates ACROSS batches. Per-batch cost is
    O(delta band rows + touched index buckets); the corpus contributes
    only an equi-join probe of its persisted index.
    """
    pairs, d_rows = incremental_lsh_pairs(
        delta, index, id_col, text_col,
        n=n, num_hashes=num_hashes, bands=bands,
        est_threshold=est_threshold, max_bucket=max_bucket,
        band_rows=band_rows,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = delta.join(dropped, id_col, "left_anti")
    return survivors, d_rows


def incremental_lsh_pairs(
    delta: DataFrame,
    index: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 8,
    bands: int = 4,
    est_threshold: float = 0.75,
    max_bucket: int = 1000,
    band_rows: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Banded candidate PAIRS between a new batch and the corpus'
    persisted band index — the edge generator behind
    :func:`incremental_near_dedup` (which keeps only the dropped
    right-hand ids) and :func:`incremental_connected` (which needs the
    edges themselves to maintain transitive groups). Returns
    ``(pairs, band_rows)``: distinct ``(id_a, id_b)`` with
    ``id_a < id_b``, ``id_b`` always a delta doc, estimated Jaccard ≥
    ``est_threshold``; and the delta's band rows to append to the
    index. Same plan shape and hot-bucket guard as the caller's
    docstring describes — the corpus text is never re-shingled.

    ``band_rows``, when given, is the delta's own
    :func:`minhash_band_rows` output ALREADY materialized (e.g. read
    back from the just-written index partition) — callers that persist
    the index anyway pass it so the delta's minhash is computed exactly
    once instead of once per consumer of the pair plan."""
    keys = ["band"] + [
        f"__k{j}" for j in range(num_hashes // bands)
    ]
    d_rows = (
        band_rows
        if band_rows is not None
        else minhash_band_rows(
            delta, id_col, text_col,
            n=n, num_hashes=num_hashes, bands=bands,
        )
    )
    if index is None:
        all_rows = d_rows.withColumn("__new", F.lit(True))
    else:
        all_rows = index.select(
            "__id", *keys, "__sig", F.lit(False).alias("__new")
        ).unionByName(d_rows.withColumn("__new", F.lit(True)))
    ok = (
        all_rows.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__bn"),
            F.sum(F.col("__new").cast("int")).alias("__dn"),
        )
        .filter(
            (F.col("__bn") >= 2)
            & (F.col("__bn") <= max_bucket)
            & (F.col("__dn") >= 1)  # buckets no delta row touches: skip
        )
        .select(*keys)
    )
    live = all_rows.join(ok, keys)
    # candidate pairs: delta doc (right) vs any LOWER-id doc (left) in
    # the same bucket — corpus or delta; the strict < plus __new on the
    # right covers both generators in one join
    a = live.select(
        *keys,
        F.col("__id").alias("__ida"),
        F.col("__sig").alias("__siga"),
    )
    b = live.filter(F.col("__new")).select(
        *keys,
        F.col("__id").alias("__idb"),
        F.col("__sig").alias("__sigb"),
    )
    est = F.size(
        F.filter(
            F.zip_with(
                F.col("__siga"), F.col("__sigb"), lambda x, y: x == y
            ),
            lambda m: m,
        )
    ) / F.lit(float(num_hashes))
    pairs = (
        a.join(b, keys)
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(est >= F.lit(est_threshold))
        .select(
            F.col("__ida").alias("id_a"), F.col("__idb").alias("id_b")
        )
        .distinct()
    )
    return pairs, d_rows


def incremental_connected(
    pairs: DataFrame,
    labels: DataFrame | None,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    stats: dict | None = None,
) -> DataFrame:
    """Union a NEW batch's near-dup edges into stored component labels,
    re-converging only the TOUCHED components — the incremental sibling
    of :func:`connected_components` for the nightly-ingest shape.

    ``labels`` is the accumulated ``(id, root)`` table from previous
    ingests (None for the first batch; roots are component minima, and
    every root labels itself). Each new edge's endpoints are first
    CONTRACTED through the stored labels (endpoint → its stored root,
    or itself when unseen), so the fixpoint iteration runs over a graph
    of O(delta edges) nodes — old roots and fresh ids — never the
    corpus. Untouched components contribute zero rows to the fixpoint
    (pinned in tests/test_incremental_dedup.py) and pass through the
    final label update as a no-op left join. Because stored roots are
    their components' minima, taking the min over contracted node ids
    reproduces the global min — batch replay is label-identical to
    one-shot :func:`connected_components` over the unioned edges.

    ``stats``, when a dict, receives ``fixpoint_nodes`` (nodes that
    entered the fixpoint — the recomputation bound) and ``rounds``."""
    if labels is None:
        contracted = pairs.select(
            F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
        )
    else:
        la = labels.select(
            F.col("id").alias(id_a), F.col("root").alias("__ra")
        )
        lb = labels.select(
            F.col("id").alias(id_b), F.col("root").alias("__rb")
        )
        contracted = (
            pairs.join(la, id_a, "left")
            .join(lb, id_b, "left")
            .select(
                F.coalesce(F.col("__ra"), F.col(id_a)).alias("id_a"),
                F.coalesce(F.col("__rb"), F.col(id_b)).alias("id_b"),
            )
        )
    cc_stats: dict | None = {} if stats is not None else None
    remap = connected_components(contracted, "id_a", "id_b", stats=cc_stats)
    if stats is not None:
        stats["fixpoint_nodes"] = remap.count()  # bounded: O(delta edges)
        stats["rounds"] = cc_stats["rounds"]
    if labels is None:
        return remap
    ren = remap.select(
        F.col("id").alias("root"), F.col("root").alias("__nr")
    )
    updated = labels.join(ren, "root", "left").select(
        "id", F.coalesce(F.col("__nr"), F.col("root")).alias("root")
    )
    fresh = remap.join(labels.select("id"), "id", "left_anti")
    return updated.unionByName(fresh.select("id", "root"))


def incremental_exact_dedup(
    delta: DataFrame,
    index: DataFrame | None,
    id_col: str,
    key: Column,
) -> tuple[DataFrame, DataFrame]:
    """Exact-dedup a NEW batch against the EXISTING corpus via its
    persisted key index (one `__key` column of the distinct dedup keys
    seen so far). Returns ``(survivors, new_keys)``: the delta rows
    that survive (first occurrence per key within the delta, none
    whose key is already indexed) and the SURVIVORS' distinct keys to
    append to the index.

    Contrast with :func:`incremental_near_dedup`: equality is
    transitive, so a survivors-only index is exact here — every
    dropped doc's key equals its keeper's key, which IS in the index.
    Ascending-id batch replay is row-identical to one-shot
    keep-min-id-per-key (``dedup_groups``' keeper policy).

    Scale shape: one shuffle on the key for the within-delta
    keep-first, plus a key equi-join against the index (broadcast when
    the index is small, shuffle-hash once it is not); the index is
    O(distinct corpus keys) — the minimal state any exact incremental
    dedup must carry.
    """
    keyed = delta.withColumn("__key", key)
    if index is not None:
        keyed = keyed.join(index, "__key", "left_anti")
    w = Window.partitionBy("__key").orderBy(F.col(id_col))
    survivors = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return survivors.drop("__key"), survivors.select("__key").distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    algorithm: str = "label",
    stats: dict | None = None,
) -> DataFrame:
    """(id, root) per id appearing in ``pairs``: root = the minimum id
    of the id's connected component (transitive closure of the pair
    relation).

    Min-label propagation to a fixpoint: each round every node takes
    min(own label, neighbors' labels) — one equi-join + one groupBy per
    round, converging in O(component diameter) rounds. Near-dup
    components are shallow (docs similar to a common template), so the
    bound is small in practice; ``max_iters`` caps pathological chains.
    Each round is ``localCheckpoint``-ed: iterative self-joins
    otherwise double the lineage per round and the 20th plan would be
    2^20 nodes. The only driver-side values are the per-round changed
    COUNTS (the convergence test), never rows — the plan scales like
    any iterative graph job.

    ``algorithm='two_phase'`` switches to the alternating
    large-star/small-star formulation (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): rounds drop from
    O(component diameter) to O(log n) — the right choice for deep
    chain-shaped components — with the identical per-round plan
    primitives (equi-join + min-aggregate). Near-dup components are
    usually shallow (docs similar to one template), so min-label stays
    the default. ``stats``, when a dict, receives {"rounds": N} for
    either algorithm.
    """
    if algorithm == "two_phase":
        return _connected_two_phase(pairs, id_a, id_b, max_iters, stats)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # Materialize the edge list ONCE: every round joins against it, and
    # without the checkpoint the (possibly expensive) pair-generation
    # plan above it would re-execute per round.
    edges = pairs.select(
        F.col(id_a).alias("__s"), F.col(id_b).alias("__d")
    ).unionByName(
        pairs.select(F.col(id_b).alias("__s"), F.col(id_a).alias("__d"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("__s").alias("__id"))
        .distinct()
        .withColumn("__root", F.col("__id"))
        .localCheckpoint()
    )
    def _step(cur: DataFrame) -> DataFrame:
        via = edges.join(
            cur.select(
                F.col("__id").alias("__d"), F.col("__root").alias("__nr")
            ),
            "__d",
        ).select(
            F.col("__s").alias("__id"),
            F.col("__nr").alias("__root"),
            F.lit(False).alias("__self"),
        )
        # the self-contribution row is flagged, so the PREVIOUS label
        # (max over the when ⇒ the one self row's root, typed like the
        # ids) and min(new) fall out of the SAME aggregate — no
        # per-round join of new-vs-old labels for the convergence
        # test; min includes self ⇒ __root ≤ __old, strict < = changed
        return (
            cur.withColumn("__self", F.lit(True))
            .unionByName(via)
            .groupBy("__id")
            .agg(
                F.min("__root").alias("__root"),
                F.max(
                    F.when(F.col("__self"), F.col("__root"))
                ).alias("__old"),
            )
            # lazy: materialized by the per-check `improved` count (or,
            # for the inner step of a pair, as part of the outer step's
            # job) — never a job of its own.
            .localCheckpoint(eager=False)
        )

    rounds = 0
    while rounds < max_iters:
        # TWO propagation steps share one materializing job (the
        # convergence count): the inner step's lazy checkpoint computes
        # as part of the outer step's count job, halving job
        # submissions and count passes per converged fixpoint. Testing
        # only the SECOND step is sound: label propagation is monotone,
        # so if a step changes nothing its input already was the
        # fixpoint — at worst one extra no-op pass runs.
        steps = min(2, max_iters - rounds)
        for _ in range(steps - 1):
            labels = _step(labels).select("__id", "__root")
        new = _step(labels)
        improved = new.filter(F.col("__root") < F.col("__old")).count()
        labels = new.select("__id", "__root")
        rounds += steps
        if improved == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("__id").alias("id"), F.col("__root").alias("root")
    )


def _connected_two_phase(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iters: int,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al.): the edge set
    converges to stars — every node pointing directly at its component
    minimum — in O(log n) alternations regardless of diameter.

    large-star: per node u, hook every LARGER neighbor to
    min(N(u) ∪ {u}); small-star: per node u (edges oriented
    large→small), hook u and its smaller neighbors to the minimum.
    Both are one min-aggregate + one equi-join per step — the same
    shuffle primitives as min-label propagation, never a collect of
    neighbor lists. Edges stay canonically (big, small); convergence =
    an empty exceptAll delta (a count, the only driver-side value).
    """
    # canonical orientation big→small, self-loops dropped
    e = (
        pairs.select(F.col(id_a).alias("__a"), F.col(id_b).alias("__b"))
        .filter(F.col("__a") != F.col("__b"))
        .select(
            F.greatest("__a", "__b").alias("__u"),
            F.least("__a", "__b").alias("__v"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("__u").alias("__id"))
        .unionByName(e.select(F.col("__v").alias("__id")))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iters):
        # --- large-star: symmetric neighborhoods ---
        sym = e.unionByName(
            e.select(F.col("__v").alias("__u"), F.col("__u").alias("__v"))
        )
        m = sym.groupBy("__u").agg(
            F.least(F.min("__v"), F.first("__u")).alias("__m")
        )
        ls = (
            sym.filter(F.col("__v") > F.col("__u"))
            .join(m, "__u")
            .select(F.col("__v").alias("__u"), F.col("__m").alias("__v"))
            .filter(F.col("__u") != F.col("__v"))
        )
        # --- small-star: edges already point big→small ---
        ms = ls.groupBy("__u").agg(F.min("__v").alias("__m"))
        ss = (
            ls.join(ms, "__u")
            .select(F.col("__v").alias("__u"), F.col("__m").alias("__v"))
            .filter(F.col("__u") != F.col("__v"))
            .unionByName(ms.select(F.col("__u"), F.col("__m").alias("__v")))
            .distinct()
            # lazy: materialized by the convergence job below, so each
            # round costs ONE Spark job instead of checkpoint + two
            # counts (matters for iterative wall-clock; the per-round
            # PLAN is unchanged).
            .localCheckpoint(eager=False)
        )
        rounds += 1
        # set equality (both sides distinct): symmetric difference
        # empty — one early-exit action per round.
        delta = ss.exceptAll(e).unionByName(e.exceptAll(ss))
        converged = delta.isEmpty()
        e = ss
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # converged stars: every non-root points at its component min (the
    # min-agg is insurance for a max_iters cutoff mid-convergence)
    roots = nodes.join(
        e.select(F.col("__u").alias("__id")).distinct(), "__id", "left_anti"
    ).select(F.col("__id").alias("id"), F.col("__id").alias("root"))
    return (
        e.select(F.col("__u").alias("id"), F.col("__v").alias("root"))
        .groupBy("id")
        .agg(F.min("root").alias("root"))
        .unionByName(roots)
    )


def dedup_connected_keep_min(
    pairs: DataFrame, df: DataFrame, id_col: str
) -> DataFrame:
    """Exact transitive near-dup dedup: keep ONE representative (the
    minimum id) per connected component of the pair graph — a 3-chain
    A~B~C keeps exactly A, where the single-sweep keep-first policy
    would keep A and C."""
    comp = connected_components(pairs)
    drop = (
        comp.filter(F.col("root") != F.col("id"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def dedup_connected_keep_best(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Transitive near-dup dedup keeping the HIGHEST-SCORING member of
    each component (ties → min id) — the production policy: when a
    near-dup group mixes a clean original with truncated/boilerplate
    copies, keep the best one, not the smallest id. One extra
    equi-join (components ⋈ scores) and a per-root argmax window on
    top of :func:`connected_components`; rows in no component are
    always kept."""
    comp = connected_components(pairs)
    scored = comp.join(
        df.select(F.col(id_col).alias("id"), F.col(score_col).alias("__sc")),
        "id",
    )
    w = Window.partitionBy("root").orderBy(F.col("__sc").desc(), F.col("id"))
    drop = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def simhash_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 28,
    token_hash: str = "md5",
) -> DataFrame:
    """(__id, __fp) SimHash fingerprints, row-relationally: explode
    tokens, hash each token ONCE, then ``bits`` trivial
    sum(±1)-by-bit aggregates per doc and a final bit-assembly.

    This is the same explode-vs-array-expression tradeoff as MinHash
    (module docstring): the array form (`text.simhash16`) re-evaluates
    the token-hash array inside every per-bit lambda — fine for one
    16-bit fingerprint column in a mixed projection, ~bits× redundant
    as the driver of a dedup join. Here hashing is O(tokens) total and
    the per-bit work is integer ops on an already-computed column.

    ``token_hash``: "md5" (default) hashes each token with native md5
    and parses the first 15 hex digits (conv) — every op whole-stage
    codegen, measured ~2× faster end-to-end, 60 usable bits.
    "rolling" keeps parity with the dialect's `rolling_hash`
    fingerprint (per-character interpreted HOF lambda — caps at 31
    bits) and stays available for the dialect-parity tests. Both are
    bit-identical cross-engine."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokenize(F.col(text_col))).alias("__t"),
    )
    if token_hash == "md5":
        h = F.conv(F.substring(F.md5(F.col("__t")), 1, 15), 16, 10).cast(
            "long"
        )
    else:
        from nutdb_spark.operators.text import rolling_hash

        h = rolling_hash(F.col("__t"))
    rows = toks.select("__id", h.alias("__h"))
    balances = [
        F.sum(
            F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"__b{j}")
        for j in range(bits)
    ]
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"__b{j}") > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return rows.groupBy("__id").agg(*balances).select(
        "__id", fp.alias("__fp")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bands: int = 4,
    bits: int = 28,
    max_hamming: int = 3,
    token_hash: str = "md5",
) -> DataFrame:
    """SimHash near-dup pairs: band the per-doc SimHash fingerprint,
    equi-join docs sharing any (band, value), verify candidates by
    Hamming distance ≤ ``max_hamming`` via bit_count(xor).

    Pigeonhole guarantee: with ``bands`` bands, any pair within
    Hamming distance bands-1 shares at least one intact band, so recall
    at ``max_hamming ≤ bands-1`` is exact — same banding logic as
    MinHash-LSH but over a single integer fingerprint, which makes the
    candidate key a 2-int struct instead of a hash-array slice.

    Scale note: 28 bits (7-bit bands) is the widest the 31-bit
    `rolling_hash` supports cleanly and keeps band values from
    saturating on fixture-sized corpora; production at 100 TB uses a
    64-bit token hash and 16-bit bands — same plan shape (one explode
    to bands rows, one equi-join on (band, value), distinct, JVM
    bit_count filter), and candidate fan-out per band value is the
    same freq² bound as the Jaccard guard.
    """
    width = bits // bands
    mask = (1 << width) - 1
    base = simhash_df(
        df, id_col, text_col, bits=bits, token_hash=token_hash
    )
    banded = base.select(
        "__id",
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("__fp"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bv"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__fp").alias("__fa"),
            F.col("b.__fp").alias("__fb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    span: int = 10,
    max_freq: int = 1,
) -> DataFrame:
    """Span-level corpus dedup with document REASSEMBLY (the C4-style
    "remove lines duplicated across the corpus" operator, on fixed
    ``span``-token windows since the fixture has no line breaks —
    the unit is a knob, the plan is identical for lines/sentences).

    Every document splits into consecutive span-token chunks; a chunk
    occurring more than ``max_freq`` times ACROSS THE CORPUS is cut
    from every document, and each document is rebuilt from its
    surviving chunks in order. Output (doc_id, clean_text, n_kept);
    documents whose every chunk was cut drop out entirely.

    Scale shape: chunking is per-row array math (no explode until the
    frequency count), the frequency table is a hash-groupBy on the
    chunk hash, membership is an equi-join, and reassembly is a
    per-document collect_list — bounded by a single document's size,
    the same per-group memory contract as any per-doc aggregate.
    """
    from nutdb_spark.operators.text import tokenize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    nch = F.ceil(F.size("__toks") / F.lit(span)).cast("int")
    chunked = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(
                    F.slice("__toks", i * span + 1, span), " "
                ),
            )
        ).alias("pos", "chunk"),
    )
    freq = chunked.groupBy("chunk").agg(F.count(F.lit(1)).alias("__n"))
    kept = chunked.join(freq, "chunk").filter(F.col("__n") <= max_freq)
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )


# --- content-defined chunking (CDC) dedup -----------------------------------

_CDC_P = 1_000_000_007
_CDC_W = 8  # rolling-window width in characters


def _cdc_weights() -> list[int]:
    return [pow(31, j, _CDC_P) for j in range(_CDC_W)]


def _let(val: Column, body) -> Column:
    """Bind `val` to a lambda variable so `body` references it as a
    cheap attribute instead of re-evaluating the expression tree at
    every use (Catalyst CollapseProject inlines projected aliases
    into lambda bodies — a regexp normalize referenced 8×len times
    turns O(len) into O(len²·regexp) without this)."""
    return F.get(F.transform(F.array(val), body), 0)


def cdc_chunks(text: Column, mask: int = 64) -> Column:
    """Content-defined chunk boundaries (gear/Rabin style): position i
    ends a chunk when the polynomial hash of the trailing 8-character
    window is ≡ 0 (mod `mask`) — boundaries move with the CONTENT, so
    an insertion early in a document shifts chunk offsets without
    changing the chunks downstream (what fixed-size chunking cannot
    do, and why CDC is the span-dedup primitive at corpus scale).

    Every position's window hash is an independent 8-term sum over a
    let-bound codepoint array (O(1) element_at per term, no
    sequential state), so the whole operator is one JVM expression
    tree: codes → filter positions → boundary list → slice
    substrings. Average chunk length ≈ mask characters.
    """
    ws = _cdc_weights()

    def with_s(s):
        codes_expr = F.transform(
            F.split(s, ""), lambda c: F.ascii(c).cast("long")
        )

        def with_codes(codes):
            ln = F.length(s)

            # Σ_j code(s[i-j]) · 31^j (mod p) — weight literals
            def wh(i):
                h = F.lit(0).cast("long")
                for j, w in enumerate(ws):
                    h = h + F.element_at(codes, (i - F.lit(j)).cast("int")) * F.lit(w)
                return (h % F.lit(_CDC_P)) % F.lit(mask)

            # a boundary at the final position is a no-op — excluding
            # it (i < ln) keeps `bounds` strictly increasing with no
            # dedup pass
            bpos = F.filter(
                F.sequence(F.lit(_CDC_W), F.greatest(ln, F.lit(_CDC_W))),
                lambda i: (i < ln) & (wh(i) == 0),
            )
            bounds = F.concat(
                F.array(F.lit(1)),
                F.transform(bpos, lambda i: i + 1),
                F.array(ln + 1),
            )
            chunks = F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(bounds) - 1, F.lit(1))
                ),
                lambda j: F.call_function(
                    "substring",
                    s,
                    F.element_at(bounds, j),
                    F.element_at(bounds, j + 1) - F.element_at(bounds, j),
                ),
            )
            return F.when(ln > 0, chunks).otherwise(F.slice(chunks, 1, 0))

        return _let(codes_expr, with_codes)

    return _let(text, with_s)


def cdc_chunk_dedup(
    df: "DataFrame", id_col: str, text_col: str, *, mask: int = 64
) -> "DataFrame":
    """Corpus-wide CDC chunk dedup: chunk every document, md5 each
    chunk, keep the (doc, position)-lexicographically-first
    occurrence of each distinct chunk, and report per document how
    many chunks / characters were duplicates of earlier content.

    Scale shape: chunking is row-local codegen; the dedup is ONE
    hash-groupBy on the chunk digest (map-side partial) joined back
    on the same key — the identical bucketed equi-join discipline as
    exact dedup, never all-pairs. Chunk payloads leave the row only
    as 32-byte digests.
    """
    from nutdb_spark.operators.text import normalize_text

    rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            cdc_chunks(normalize_text(F.col(text_col)), mask=mask)
        ).alias("idx", "chunk"),
    ).select(
        "doc_id",
        "idx",
        F.md5(F.col("chunk")).alias("h"),
        F.length("chunk").alias("chunk_len"),
    )
    firsts = rows.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    j = rows.join(firsts, "h")
    dup = (F.col("doc_id") != F.col("first.doc_id")) | (
        F.col("idx") != F.col("first.idx")
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(dup.cast("long")).alias("n_dup"),
        F.sum(F.when(dup, F.col("chunk_len")).otherwise(0)).alias(
            "dup_chars"
        ),
    )


def incremental_cdc_dedup(
    delta: "DataFrame",
    index: "DataFrame | None",
    id_col: str,
    text_col: str,
    *,
    mask: int = 64,
) -> tuple["DataFrame", "DataFrame"]:
    """CDC span dedup of a NEW batch against the EXISTING corpus via
    its persisted chunk-digest index (one `h` column of the distinct
    md5 digests seen so far). Returns ``(stats, new_digests)``: the
    per-document dup accounting (same schema as
    :func:`cdc_chunk_dedup`) and the digests NOT previously indexed
    (chunk equality is transitive, so an all-distinct-digests index is
    exact — the incremental_exact_dedup argument, at span
    granularity). Ascending-id batch replay reproduces the one-shot
    accounting row-for-row.

    Scale shape: chunking stays row-local codegen; the index probe is
    one digest equi-join (broadcast while small); within-delta firsts
    are the same digest groupBy as the one-shot operator. The index is
    O(distinct corpus chunks) — the minimal state any span-level
    incremental dedup must carry.
    """
    from nutdb_spark.operators.text import normalize_text

    rows = delta.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            cdc_chunks(normalize_text(F.col(text_col)), mask=mask)
        ).alias("idx", "chunk"),
    ).select(
        "doc_id",
        "idx",
        F.md5(F.col("chunk")).alias("h"),
        F.length("chunk").alias("chunk_len"),
    )
    if index is not None:
        rows = rows.join(
            index.select("h", F.lit(True).alias("__seen")), "h", "left"
        ).withColumn("__seen", F.coalesce(F.col("__seen"), F.lit(False)))
    else:
        rows = rows.withColumn("__seen", F.lit(False))
    # chunk the delta EXACTLY ONCE: rows fans out to the firsts
    # groupBy, the accounting join AND new_digests — without the cut
    # the CDC chunking re-ran per consumer (and again when the caller
    # writes the digests then unions the stats)
    rows = rows.localCheckpoint()
    firsts = rows.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    j = rows.join(firsts, "h")
    dup = F.col("__seen") | (
        (F.col("doc_id") != F.col("first.doc_id"))
        | (F.col("idx") != F.col("first.idx"))
    )
    stats = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(dup.cast("long")).alias("n_dup"),
        F.sum(F.when(dup, F.col("chunk_len")).otherwise(0)).alias(
            "dup_chars"
        ),
    )
    new_digests = (
        rows.filter(~F.col("__seen")).select("h").distinct()
    )
    return stats, new_digests


def fuzzy_match_join(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    dirty_id: str,
    dirty_name: str,
    clean_id: str,
    clean_name: str,
    threshold: float,
) -> DataFrame:
    """Entity resolution — fuzzy-join dirty strings to a clean catalog
    by BOUNDED blocking + similarity verify + best-match argmax:

    1. Blocking: candidates share the prefix trigram OR the suffix
       trigram (two equi-joins, distinct union). One char-edit keeps
       at least one of the two intact for strings of length ≥ 6
       (an interior edit keeps both; an edit in the first 3 chars
       keeps the suffix, in the last 3 the prefix) — so recall is
       exact for single-edit noise, with a FIXED 2-key fan-out per
       row instead of the full q-gram inverted index (which needs
       hot-shingle caps — cf. jaccard_pairs).
    2. Verify: jaroWinklerSimilarity ≥ threshold on the candidates
       only (bit-exact vs DuckDB's native, per the tier-11 pins).
    3. Resolve: best match per dirty row by (similarity desc, clean
       id asc) — deterministic ties.

    Resolution runs at DISTINCT-name level on BOTH sides (real
    catalogs repeat strings; every repeated row rides one
    verification — measured 37 s → ~2 s on the suite fixture), and
    candidates carry a |length difference| ≤ 1 band — single-edit
    noise never shifts length by more, and it keeps the expensive
    similarity DP off hopeless pairs. Best match is chosen per dirty
    NAME by (similarity desc, clean name asc); the surviving clean
    name is represented by its MINIMUM clean id — fully
    deterministic.

    Scale shape: two shuffle equi-joins on 3-char keys + one bounded
    window over distinct names, then one hash join back to the dirty
    rows — never an all-pairs product. The same blocking discipline
    at 100 TB; skewed blocks behave like hot LSH buckets."""
    from nutdb_spark.functions.registry import SCALAR_FNS

    d = dirty.select(
        F.col(dirty_id).alias("did"), F.col(dirty_name).alias("dname")
    )
    c = clean.select(
        F.col(clean_id).alias("cid"), F.col(clean_name).alias("cname")
    )

    def keyed(df, name_col, key):
        pre = F.substring(F.col(name_col), 1, 3)
        suf = F.substring(
            F.col(name_col), F.length(name_col) - 2, 3
        )
        return df.withColumn(key, F.explode(F.array(pre, suf)))

    dnames = d.select("dname").distinct()
    cnames = c.select("cname").distinct()
    cand = (
        keyed(dnames, "dname", "bk")
        .join(keyed(cnames, "cname", "bk"), "bk")
        .filter(
            F.abs(F.length("dname") - F.length("cname")) <= 1
        )
        .select("dname", "cname")
        .distinct()
    )
    jw = SCALAR_FNS["jaroWinklerSimilarity"](
        F.col("dname"), F.col("cname")
    )
    verified = cand.withColumn("jw", jw).filter(
        F.col("jw") >= F.lit(threshold)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dname").orderBy(
        F.col("jw").desc(), F.col("cname")
    )
    best = (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    rep = c.groupBy("cname").agg(F.min("cid").alias("cid"))
    return (
        d.join(best, "dname")
        .join(rep, "cname")
        .select("did", "dname", "cid", "cname", "jw")
    )


def incremental_exact_dedup_tombstone(
    delta: DataFrame,
    index: DataFrame | None,
    id_col: str,
    key: Column,
    deletes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Deletion-aware incremental exact dedup — the GDPR/right-to-be-
    forgotten shape. The persisted index carries (__key, __keeper):
    a delete batch PURGES every index entry whose keeper id is
    deleted BEFORE the new delta applies, so a future arrival of that
    key is insertable again. Dedup decisions are NOT retroactive
    (previously dropped duplicates were never persisted — deleting a
    keeper cannot resurrect them), which is the production contract:
    the corpus after replay equals "keep-min-id per key among rows
    that were never deleted and never blocked at their ingest time".

    Returns ``(survivors, new_index_entries, purged_index)`` — callers
    persist purged_index ∪ new_index_entries as the next index.

    Scale shape: the purge is an id equi-join (delete sets are tiny —
    broadcast); the rest is :func:`incremental_exact_dedup`'s one
    key shuffle + index anti-join."""
    if index is not None and deletes is not None:
        index = index.join(
            F.broadcast(
                deletes.select(F.col(id_col).alias("__keeper"))
            ),
            "__keeper",
            "left_anti",
        )
    keyed = delta.withColumn("__key", key)
    if index is not None:
        keyed = keyed.join(index.select("__key"), "__key", "left_anti")
    w = Window.partitionBy("__key").orderBy(F.col(id_col))
    survivors = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    new_entries = survivors.select(
        "__key", F.col(id_col).alias("__keeper")
    )
    return survivors.drop("__key"), new_entries, index


def _rebuild_uncovered(
    docs: DataFrame, occ: DataFrame, rep: DataFrame, k: int
) -> DataFrame:
    """Shared span rebuild for the repeated-ngrams family: given the
    tokenized documents ``(doc_id, toks)``, the k-gram occurrence
    list ``(doc_id, s, gram)`` and the over-threshold grams
    ``rep(gram)``, emit (doc_id, n_words, n_removed, clean_text).

    Duplicated-gram START positions are collected per document (one
    gram equi-join + one doc-keyed groupBy) and the kept words are an
    index-aware ``filter`` over the token array: position p survives
    iff no duplicated gram starts in (p-k, p]. This replaces the
    original explode([s, s+k-1]) → DISTINCT → per-word anti-join →
    re-sorting groupBy pipeline: three exchanges fewer, and the
    per-WORD exchange (every corpus word shuffled as its own row)
    disappears — only start-position ints and each document's token
    array (once) cross the wire. Per-document compute is
    O(n_toks · n_dup_starts) interpreted lambda steps, bounded by the
    module's single-document contract. The coverage set (union of
    [s, s+k-1] membership) and the rebuild order (original word
    order) are definitionally the old ones, so output is identical.
    """
    starts = (
        occ.join(rep, "gram")
        .groupBy("doc_id")
        .agg(F.collect_list("s").alias("__ss"))
    )
    ss = F.coalesce(F.col("__ss"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("toks"),
        lambda w, i: ~F.exists(
            ss, lambda s: (s <= i + 1) & (i + 1 <= s + (k - 1))
        ),
    )
    n_words = F.size("toks").cast("long")
    # two projections: __kept is referenced twice downstream and the
    # filter HOF gets no CSE, so bind it once (CollapseProject keeps
    # non-cheap multi-referenced producers apart)
    return (
        docs.join(starts, "doc_id", "left")
        .select("doc_id", "toks", kept.alias("__kept"))
        .select(
            "doc_id",
            n_words.alias("n_words"),
            (n_words - F.size("__kept")).cast("long").alias("n_removed"),
            F.array_join("__kept", " ").alias("clean_text"),
        )
    )


def dedup_repeated_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    max_freq: int = 1,
) -> DataFrame:
    """Exact-substring span removal over SLIDING word ``k``-grams — the
    Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better") suffix-array dedup semantics, re-expressed
    relationally: any word ``k``-gram occurring more than ``max_freq``
    times across the corpus marks its ``k`` word positions for
    removal IN EVERY occurrence; overlapping hits union into maximal
    covered spans, and each document is rebuilt from its uncovered
    words in order.

    Contrast with ``dedup_spans``: that operator cuts DISJOINT fixed
    chunks (the C4 line-dedup shape, alignment-sensitive), this one is
    shift-invariant — a duplicated passage is caught at any offset,
    the published exact-substring semantics (the suffix array is an
    index choice, not a semantic one; at fixture scale the k-gram
    inverted index computes the identical cover).

    Output: (doc_id, n_words, n_removed, clean_text) for every input
    document — fully-covered documents surface with empty clean_text
    rather than vanishing, so the removal rate is auditable.

    Scale shape: the k-gram occurrence list is an explode (k× the
    corpus words — the published method pays the same suffix blow-up
    on disk); the frequency table is one hash-groupBy on the gram;
    coverage is an equi-join back whose duplicated START positions
    are collected per document; reassembly is an index-aware filter
    over the token array — bounded by a single document, the
    per-group contract shared with dedup_spans. No Python anywhere;
    every stage is codegen'd or a catalyst HOF.
    """
    from nutdb_spark.operators.text import ngrams, tokenize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokenize(F.col(text_col)), lambda t: F.length(t) > 0
        ).alias("toks"),
    )
    occ = base.select(
        "doc_id",
        F.posexplode(ngrams(F.col("toks"), k)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("s"), "gram")
    rep = (
        occ.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_freq)
        .select("gram")
    )
    return _rebuild_uncovered(base, occ, rep, k)


def oracle_dedup_repeated_ngrams(
    *,
    k: int = 8,
    max_freq: int = 1,
    where: str = "TRUE",
    source: str = "documents",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of dedup_repeated_ngrams over ``source``
    (returns a full SELECT; compose with an outer projection)."""
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim({text_expr}), '\\s+'),
                     t -> length(t) > 0) AS t
  FROM {source} WHERE {where}),
occ AS (
  SELECT doc_id, unnest(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS s,
         t FROM base),
grams AS (
  SELECT doc_id, s, array_to_string(t[s:s+{k - 1}], ' ') AS gram FROM occ),
rep AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) > {max_freq}),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(s, s + {k})) AS p
  FROM grams JOIN rep USING (gram)),
wordpos AS (
  SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, t FROM base),
kept AS (
  SELECT w.doc_id, w.p, w.t[w.p] AS w
  FROM wordpos w ANTI JOIN covered c ON w.doc_id = c.doc_id AND w.p = c.p),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(w, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT b.doc_id,
       CAST(len(b.t) AS BIGINT) AS n_words,
       CAST(len(b.t) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r USING (doc_id)"""


def incremental_repeated_ngrams(
    delta: DataFrame,
    index: "tuple[DataFrame, DataFrame, DataFrame] | None",
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    max_freq: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Corpus-delta form of :func:`dedup_repeated_ngrams` — the
    nightly-ingest pattern for exact-substring span removal, where a
    NEW batch can flip k-grams of ALREADY-CLEANED documents over the
    frequency threshold (removal hits every occurrence, so the
    operator must emit revisions for those old documents, unlike the
    keep-first incremental family where history is immutable).

    ``index`` is the persisted corpus state — ``(occ, docs, cnt)``:
    the k-gram occurrence list (doc_id, s, gram), the tokenized
    documents (doc_id, toks), and the gram frequency table
    (gram, cnt). This is corpus-sized on disk by necessity (the
    published method persists a suffix array of the corpus for the
    same reason); what the delta batch SAVES is compute — only the
    delta is re-shingled, and only TOUCHED old documents (those with
    an occurrence of a gram whose count first crossed ``max_freq``
    this batch) are re-cleaned.

    Re-ingesting an EXISTING doc_id is an in-place revision: the
    stored version is purged (occurrences, text, and count
    contributions) before the new text is indexed, and grams whose
    rep-status drops back below ``max_freq`` uncover their spans in
    surviving documents, which re-emit — equivalent to
    :func:`delete_repeated_ngrams` followed by a fresh ingest, in one
    pass.

    Returns ``(cleaned, occ', docs', cnt')``: per-doc output rows
    (the dedup_repeated_ngrams schema) for the delta ∪ touched set,
    and the three updated state frames to persist. Merging each
    batch's ``cleaned`` (later batches overriding earlier rows by
    doc_id) replays the one-shot operator row-for-row.

    Scale shape: count merge is a gram-key outer join (both sides
    hash-partitioned on gram); the touched set is a semi-join of the
    stored occurrence list against the flipped grams (flipped is
    delta-bounded — at most one flip per distinct delta gram);
    re-cleaning joins occurrences against the new frequency table for
    the touched docs only. No stage is corpus-sized except the state
    union writes, which is the cost of owning the index at all.
    """
    from nutdb_spark.operators.text import ngrams, tokenize

    base = delta.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokenize(F.col(text_col)), lambda t: F.length(t) > 0
        ).alias("toks"),
    )
    # The four returned frames (cleaned, occ', docs', cnt') all hang
    # off the delta's tokenize/shingle pass, and every caller writes
    # several of them — lazily checkpoint the two no-exchange
    # subtrees so the batch is tokenized and shingled ONCE per ingest
    # however many outputs get materialized (lazy: .rdd on a
    # scan+project plan runs no job, so lazily-pinned callers stay
    # job-free at build).
    base = base.localCheckpoint(eager=False)
    d_occ = base.select(
        "doc_id",
        F.posexplode(ngrams(F.col("toks"), k)).alias("pos0", "gram"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("s"), "gram"
    ).localCheckpoint(eager=False)
    d_cnt = d_occ.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))

    if index is None:
        old_occ = None
        new_occ, new_docs, new_cnt = d_occ, base, d_cnt
        touched = base.select("doc_id")
        occ_all, docs_all = d_occ, base
    else:
        old_occ, old_docs, old_cnt = index
        delta_ids = base.select("doc_id").distinct()
        # Revision semantics: a re-ingested doc_id REPLACES its stored
        # version. Purge its old occurrences/text and decrement its
        # gram-count contribution BEFORE merging the delta in —
        # otherwise an in-place revision double-counts its grams and
        # leaves duplicate doc rows in state, corrupting every later
        # batch. Delta-bounded broadcast joins, so the guard costs
        # nothing at corpus scale.
        surv_occ = old_occ.join(
            F.broadcast(delta_ids), "doc_id", "left_anti"
        )
        surv_docs = old_docs.join(
            F.broadcast(delta_ids), "doc_id", "left_anti"
        )
        dec = (
            old_occ.join(F.broadcast(delta_ids), "doc_id")
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c_del"))
        )
        merged = (
            old_cnt.withColumnRenamed("cnt", "c_stored")
            .join(dec, "gram", "left")
            .select(
                "gram",
                F.col("c_stored"),
                (
                    F.col("c_stored")
                    - F.coalesce(F.col("c_del"), F.lit(0))
                ).alias("c_surv"),
            )
            .join(d_cnt.withColumnRenamed("cnt", "c_new"), "gram", "full")
            .select(
                "gram",
                F.coalesce(F.col("c_stored"), F.lit(0)).alias("c_old"),
                (
                    F.coalesce(F.col("c_surv"), F.lit(0))
                    + F.coalesce(F.col("c_new"), F.lit(0))
                ).alias("cnt"),
            )
        )
        new_cnt = merged.filter(F.col("cnt") > 0).select("gram", "cnt")
        # A gram whose rep-status changed in EITHER direction touches
        # every surviving old document holding it: crossing UP covers
        # their spans; dropping back DOWN (a revision removed
        # occurrences) UNCOVERS them — delete_repeated_ngrams's
        # uncovering rule, inherited by the revision path.
        changed = merged.filter(
            (F.col("c_old") > max_freq) != (F.col("cnt") > max_freq)
        ).select("gram")
        touched_old = (
            surv_occ.join(changed, "gram").select("doc_id").distinct()
        )
        touched = base.select("doc_id").union(touched_old).distinct()
        new_occ = surv_occ.unionByName(d_occ)
        new_docs = surv_docs.unionByName(base)
        occ_all, docs_all = new_occ, new_docs

    occ_t = occ_all.join(touched, "doc_id")
    rep = new_cnt.filter(F.col("cnt") > max_freq).select("gram")
    docs_t = docs_all.join(touched, "doc_id")
    cleaned = _rebuild_uncovered(docs_t, occ_t, rep, k)
    return cleaned, new_occ, new_docs, new_cnt


def delete_repeated_ngrams(
    deletes: DataFrame,
    index: "tuple[DataFrame, DataFrame, DataFrame]",
    *,
    k: int = 8,
    max_freq: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Deletion (GDPR/right-to-be-forgotten) pass for the incremental
    exact-substring index — revision semantics in the OTHER direction:
    removing documents can drop a k-gram's corpus count back to
    ``max_freq``, which UNCOVERS that span in every surviving
    occurrence, so those documents regain words and must re-emit.

    ``deletes`` is a frame of doc_id to forget; ``index`` is the
    persisted (occ, docs, cnt) state from
    :func:`incremental_repeated_ngrams`. Returns ``(cleaned, occ',
    docs', cnt')`` — revision rows for the surviving documents whose
    coverage changed, and the updated state with the deleted
    documents fully purged (their text, occurrences and count
    contributions all gone — the forget is real, not a tombstone
    that still leaks the content).

    Scale shape: the delete set is tiny next to the corpus —
    broadcast anti-joins purge occ/docs; the count decrement is one
    gram-keyed aggregate of the DELETED docs' occurrences only;
    uncovered grams are delete-bounded, and only documents touching
    one re-clean.
    """
    old_occ, old_docs, old_cnt = index
    ids = deletes.select(F.col(deletes.columns[0]).alias("doc_id")).distinct()
    del_occ = old_occ.join(F.broadcast(ids), "doc_id")
    dec = del_occ.groupBy("gram").agg(F.count(F.lit(1)).alias("c_del"))
    new_cnt = (
        old_cnt.join(dec, "gram", "left")
        .select(
            "gram",
            (
                F.col("cnt") - F.coalesce(F.col("c_del"), F.lit(0))
            ).alias("cnt"),
            F.col("cnt").alias("c_old"),
        )
        .filter(F.col("cnt") > 0)
    )
    uncovered = new_cnt.filter(
        (F.col("c_old") > max_freq) & (F.col("cnt") <= max_freq)
    ).select("gram")
    new_cnt = new_cnt.select("gram", "cnt")
    new_occ = old_occ.join(F.broadcast(ids), "doc_id", "left_anti")
    new_docs = old_docs.join(F.broadcast(ids), "doc_id", "left_anti")
    touched = new_occ.join(uncovered, "gram").select("doc_id").distinct()

    occ_t = new_occ.join(touched, "doc_id")
    rep = new_cnt.filter(F.col("cnt") > max_freq).select("gram")
    docs_t = new_docs.join(touched, "doc_id")
    cleaned = _rebuild_uncovered(docs_t, occ_t, rep, k)
    return cleaned, new_occ, new_docs, new_cnt
