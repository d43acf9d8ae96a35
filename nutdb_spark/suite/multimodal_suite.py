"""[EXT] Multimodal-plumbing suite: binary payloads + Pandas-UDF
feature extraction, oracle-checked.

The features are computed from real bytes on the Spark side
(mapInPandas) and re-derived from the text on the DuckDB side — the
fixture text is pure ASCII, so byte length == char length and byte sum
== codepoint sum, making the UDF path exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.multimodal import extract_features, with_binary_payload
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query


@query(
    "q_multimodal_features",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                i -> CAST(unicode(substring(text, i, 1)) AS BIGINT)))
                AS BIGINT) AS byte_sum,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return extract_features(with_binary_payload(d))


_FRAME_SIZE, _STRIDE = 64, 4


@query(
    "q_multimodal_frames",
    f"""
    SELECT d.doc_id, k.k AS frame_idx,
           md5(substring(d.text, 1 + k.k * {_FRAME_SIZE}, {_FRAME_SIZE}))
             AS frame_md5,
           CAST({_FRAME_SIZE} AS BIGINT) AS frame_chars
    FROM documents d,
         (SELECT unnest(range(0, 10000, {_STRIDE})) AS k) k
    WHERE d.doc_id < 200 AND k.k < length(d.text) // {_FRAME_SIZE}
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (`sample_frames`): every
    4th 64-char frame of the fake-decoded payload, one row per frame
    with its md5. Frames fan out of the Pandas UDF as rows; the oracle
    re-derives them with substring on the text (full frames only, so
    char counts are constant and md5s align)."""
    from nutdb_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return sample_frames(
        with_binary_payload(d), frame_size=_FRAME_SIZE, stride=_STRIDE
    )


@query(
    "q_multimodal_resize",
    """
    SELECT doc_id,
           md5(substring(text, 1, 256)) AS resized_md5,
           CAST(length(text) AS BIGINT) AS n_bytes_in,
           CAST(least(length(text), 256) AS BIGINT) AS n_bytes_out
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (`resize_media`): payload in → truncated payload
    out with size metadata; the md5 of the resized payload is
    re-derived by the oracle via substring (fixture text is ASCII, so
    byte truncation == char truncation)."""
    from nutdb_spark.operators.multimodal import resize_media

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = resize_media(with_binary_payload(d), target_bytes=256)
    return out.select(
        "doc_id",
        F.md5("payload").alias("resized_md5"),
        "n_bytes_in",
        "n_bytes_out",
    )


@query(
    "q_multimodal_audio",
    """
    WITH s AS (
      SELECT doc_id,
             list_transform(range(1, length(text) // 2 + 1),
               i -> CAST(unicode(substring(text, 2*i - 1, 1))
                    + 256 * unicode(substring(text, 2*i, 1)) AS BIGINT))
               AS smp
      FROM documents WHERE doc_id < 200 AND length(text) >= 2)
    SELECT doc_id,
           CAST(len(smp) AS BIGINT) AS n_samples,
           CAST(len(smp) * 1000 // 16000 AS BIGINT) AS duration_ms,
           CAST(list_max(smp) AS BIGINT) AS peak,
           CAST(list_sum(smp) AS BIGINT) AS energy
    FROM s
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-member of the multimodal family: opaque payload → fake
    PCM16 decode → per-clip sample/duration/peak/energy stats, all
    exact ints (the oracle re-derives the samples from the ASCII
    codepoint pairs). Same Arrow-batch seam as the image path — a real
    soundfile decode activates by installing the library."""
    from nutdb_spark.operators.multimodal import audio_stats

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") >= 2))
    )
    return audio_stats(with_binary_payload(d))


# --- [EXT] round-13: perceptual-hash image dedup ------------------------------

# Clone corpus: each doc < 150 gets a "re-encoded" twin — a 10-char
# same-length splice, i.e. the same image with a small pixel patch
# changed. Same construction on both engines.
_IMG_CLONE_EDIT = "substr(text,1,20) || 'zzzzzzzzzz' || substr(text,31)"
_IMG_CORPUS = f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, {_IMG_CLONE_EDIT} AS text
FROM documents WHERE doc_id < 150 AND length(text) >= 64
"""


def _image_dedup_oracle() -> str:
    from nutdb_spark.operators.image_dedup import (
        oracle_dedup_image_pairs,
        oracle_image_ahash,
    )

    h = oracle_image_ahash(source=f"({_IMG_CORPUS})")
    return (
        oracle_dedup_image_pairs(h)
        + "\nORDER BY a, b"
    )


@query("q_dedup_image", _image_dedup_oracle())
def q_dedup_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Perceptual-hash image dedup — the dedup ladder crossed
    into the multimodal family (operators/image_dedup.py): 64-bit
    integer average-hash per payload via the Arrow-batched fake-codec
    seam, 4×16-bit band-bucket candidate join, exact bit_count(xor)
    Hamming verify at ≤ 3 bits. The oracle is the BRUTE-FORCE
    all-pairs scan, which proves the band join complete at this
    threshold (pigeonhole: ≤ 3 flipped bits leave a band exact). The
    corpus injects same-length 10-char splices as re-encoded twins —
    found at Hamming 0-3; heavier edits correctly fall outside the
    radius."""
    from nutdb_spark.operators.image_dedup import (
        dedup_image_pairs,
        image_ahash,
    )

    d = load_table(spark, sf_dir, "documents")
    clones = d.filter(
        (F.col("doc_id") < 150) & (F.length("text") >= 64)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 20),
            F.lit("zzzzzzzzzz"),
            F.expr("substring(text, 31)"),
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(clones)
    h = image_ahash(with_binary_payload(corpus))
    return dedup_image_pairs(h).orderBy("a", "b")


def _audio_dedup_oracle() -> str:
    from nutdb_spark.operators.image_dedup import (
        oracle_audio_ahash,
        oracle_dedup_image_pairs,
    )

    corpus = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 200000 AS doc_id,
       substr(text,1,60) || 'qqqqqqqqqq' || substr(text,71) AS text
FROM documents WHERE doc_id < 150 AND length(text) >= 128
"""
    h = oracle_audio_ahash(source=f"({corpus})")
    return oracle_dedup_image_pairs(h) + "\nORDER BY a, b"


@query("q_dedup_audio", _audio_dedup_oracle())
def q_dedup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Acoustic-fingerprint dedup — the second modality through
    the shared fingerprint machine (operators/image_dedup.py): the
    fake PCM16 decode (q_multimodal_audio's byte-pair convention)
    resamples each clip's sample stream to the 64-slot average-hash,
    and the SAME 4×16-bit band join + exact Hamming ≤ 3 verify finds
    re-encoded twins (same-length 10-char splices ≈ a short patched
    region of audio). Brute-force all-pairs oracle proves band
    completeness at the radius; one extractor per modality, one dedup
    plan."""
    from nutdb_spark.operators.image_dedup import (
        audio_ahash,
        dedup_image_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    clones = d.filter(
        (F.col("doc_id") < 150) & (F.length("text") >= 128)
    ).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 60),
            F.lit("qqqqqqqqqq"),
            F.expr("substring(text, 71)"),
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(clones)
    h = audio_ahash(with_binary_payload(corpus))
    return dedup_image_pairs(h).orderBy("a", "b")


@query("q_dedup_image_incremental", _image_dedup_oracle())
def q_dedup_image_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Nightly-ingest form of the perceptual-hash dedup: batch 1
    indexes the first 300 documents' hashes; batch 2 ingests the rest
    plus the re-encoded twins against the PERSISTED index
    (localCheckpoint — the persisted-state convention). A pair is
    emitted exactly once, by the batch ingesting its later member, so
    the union of the batches' pairs must equal q_dedup_image's
    one-shot output — the oracle IS the one-shot brute force. The
    band join is delta-bounded on one side: the existing corpus only
    contributes colliding rows, the property that keeps nightly image
    ingest cheap against a corpus-sized index."""
    from nutdb_spark.operators.image_dedup import (
        image_ahash,
        incremental_image_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    clones = d.filter(
        (F.col("doc_id") < 150) & (F.length("text") >= 64)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 20),
            F.lit("zzzzzzzzzz"),
            F.expr("substring(text, 31)"),
        ).alias("text"),
    )
    b1 = d.filter(F.col("doc_id") < 300).select("doc_id", "text")
    b2 = (
        d.filter(F.col("doc_id") >= 300)
        .select("doc_id", "text")
        .unionByName(clones)
    )
    p1, idx = incremental_image_pairs(
        image_ahash(with_binary_payload(b1)), None
    )
    p1 = p1.localCheckpoint()
    idx = idx.localCheckpoint()
    p2, _ = incremental_image_pairs(
        image_ahash(with_binary_payload(b2)), idx
    )
    return p1.unionByName(p2).orderBy("a", "b")
