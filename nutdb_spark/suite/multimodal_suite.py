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
