"""Driver-local rows → DataFrame through the Arrow path.

``spark.createDataFrame(list_of_rows)`` parallelizes the rows as a
PYTHON RDD: every downstream action schedules a Python-runner stage
(worker round-trip per task), which costs seconds even for ONE row —
measured on local[32]: a 1-row bounds parquet write 4–6 s via the
list path vs 0.15 s via Arrow; a 20-row collect 1.65 s vs 0.03 s.
The manifest commit protocol writes/collects several such tiny frames
per commit (stage bounds, history rows, Bloom probe values), so the tax
multiplies. Converting the rows through a pandas DataFrame flips
``createDataFrame`` onto the Arrow serializer: the data ships to the
JVM once as an Arrow batch and every action stays JVM-only.

``local_rows_df`` is the drop-in: Arrow/pandas when the types allow,
silent fallback to the plain path otherwise (nested/rare types, or a
pandas import problem) — behavior-identical output either way, the
explicit schema governs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the Python-RDD tax.

    ``rows`` is a small driver-local list of tuples; ``schema`` is a
    StructType or DDL string (required — inference is the plain path's
    job, and the Arrow writer needs the target types anyway)."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    if isinstance(schema, str):
        schema = _parse_datatype_string(schema)
    if not isinstance(schema, StructType):  # single-column shorthand etc.
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(
            list(rows), columns=[f.name for f in schema.fields]
        ).astype(object)
        # NaN (pandas' missing marker for object records) must reach
        # Spark as NULL, not float('nan')
        pdf = pdf.where(pd.notna(pdf), None)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        # nested/exotic types the Arrow converter rejects, or an empty
        # pandas edge — the plain path is always correct, just slower
        return spark.createDataFrame(list(rows), schema)
