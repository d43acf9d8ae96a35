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
