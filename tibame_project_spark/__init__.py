"""tibame_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ELT pipeline (yeha98552/tibame-project): explicit
schema ingestion, cleaning/normalization operators, dedup, star-schema joins,
group-by aggregation, zh-TW scalar functions, DML-style corrections-as-data,
idempotent partitioned materialization — plus the large-scale training-data
operators (MinHash/SimHash dedup, similarity search, text analysis, multimodal
columns) the reference never had.

Everything is declarative DataFrame / SQL so Catalyst + AQE pick the physical
plan; Python UDFs appear only where built-ins genuinely cannot express the
semantics (and then always Arrow-batched).
"""

__version__ = "0.1.0"

from tibame_project_spark.session import get_spark  # noqa: F401
