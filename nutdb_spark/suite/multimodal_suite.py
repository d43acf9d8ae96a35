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
