"""Readers (S1-S3, S7, F16).

The reference's read path is download-blob → pandas (``airflow/utils/gcp.py:
95-129``) plus BigQuery external tables over globs (``gcp.py:132-201``).
Spark natively reads globs in place — an "external table" is just a reader
with a declared schema; no data movement until a query runs. Filters and
column pruning reach the parquet footer (PushedFilters / ReadSchema), which
the pandas path could never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S1. ``path`` may be a glob (``…/{date}/*.parquet``, the reference's
    external-table pattern ``d_gmaps_reviews_src_to_ods.py:15-16``)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = True,
    skip_rows: int = 0,
) -> DataFrame:
    """S2. CSV requires a declared schema in the engine path (the reference
    mandates one for CSV external tables, ``gcp.py:173-177``); inference is
    allowed only when schema=None (raw ingestion). ``skip_rows`` models the
    reference's leading-header-rows skip (``gcp.py:173-174``) — implemented
    content-free via an index filter on a monotonically increasing file
    offset is impossible in Spark, so callers pass a content predicate for
    junk rows instead; skip_rows is honored only for skip_rows==header."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    keep_corrupt: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """S3. JSON-lines with the full declared StructType (the deep gmaps
    places schema) — inference on 3-level nested arrays-of-structs is exactly
    where pandas/BQ autodetect went wrong; we declare.

    ``keep_corrupt=True`` is the quarantine path for scraped/third-party
    feeds (the reference's crawlers regularly emit truncated lines): the
    declared schema gains a ``corrupt_col`` string column, malformed lines
    land there verbatim with every declared field NULL (PERMISSIVE mode),
    and valid lines leave it NULL — so one filter splits the feed into
    clean rows and a quarantine relation to re-scrape, instead of a whole
    task dying on one bad byte (FAILFAST) or rows vanishing silently
    (DROPMALFORMED). Requires a declared schema: quarantine semantics on
    an inferred schema would shift with the sample.

    Spark restriction (since 2.3): a query referencing ONLY the corrupt
    column (e.g. ``df.filter(corrupt.isNotNull()).count()``) raises
    AnalysisException on the raw JSON relation — ``cache()`` the returned
    frame (what a quarantine split wants anyway: one parse, two consumers)
    or write it out before splitting."""
    r = spark.read
    if keep_corrupt:
        if schema is None:
            raise ValueError("keep_corrupt requires a declared schema")
        from pyspark.sql.types import StringType, StructField

        q = StructType(schema.fields + [StructField(corrupt_col, StringType())])
        return (
            r.schema(q)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path)
        )
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def with_filename_column(df: DataFrame, col_name: str, pattern: str, group: int = 1) -> DataFrame:
    """F16: derive a column from the source filename — place_id from blob
    name (``d_gmaps_places_src_to_ods.py:117-119``), place+ref-date from
    scrape filename (``fb_scraper/normalization.py:8-13``)."""
    return df.withColumn(col_name, F.regexp_extract(F.input_file_name(), pattern, group))


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC read — same external-table semantics as S1; ORC is the columnar
    interchange format warehouses other than BigQuery commonly hand over
    (Hive/Trino lakes). Vectorized reader + predicate pushdown are native."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    kind: str = "image",
) -> DataFrame:
    """Raw-media ingest via Spark's ``binaryFile`` source: one row per file
    with (media_id = file path, kind, content, n_bytes, modified) — the
    entry point of the multimodal tier (``sources.multimodal``): feed the
    result straight to ``resize_media`` / ``extract_features``.

    The source is split-aware at the FILE level (a file never splits, so a
    payload always arrives whole in one task) and pushes down
    ``pathGlobFilter``, so a ``*.jpg`` glob never lists/reads other blobs.
    Partition sizing note from the multimodal module applies: budget
    ``maxPartitionBytes`` for payload width.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    return df.select(
        F.col("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified"),
    )
