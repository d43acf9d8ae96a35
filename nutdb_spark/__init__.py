"""nutdb_spark — a PySpark-native analytics engine with the query surface
of nutdb/nutdb (reference: a ClickHouse-flavored SQL dialect frontend;
see SURVEY.md).

The engine is Spark-first: the NutDB dialect is parsed by a Python
frontend (``nutdb_spark.frontend``) and lowered to PySpark DataFrame
plans; Catalyst/Tungsten/AQE do all optimization and physical
execution. ``connect()`` opens the in-process engine (session + managed
catalog + dialect SQL). Extension operators for large-scale
training-data pipelines (dedup, similarity search, text analysis,
multimodal columns) live under ``nutdb_spark.operators``.
"""

__version__ = "0.2.0"

from nutdb_spark.engine import NutEngine, connect  # noqa: F401
from nutdb_spark.session import get_spark  # noqa: F401
