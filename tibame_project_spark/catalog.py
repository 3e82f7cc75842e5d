"""Layered catalog: src / ods / dim / fact / mart namespaces.

Mirrors the reference's medallion layering (``airflow/utils/config.yml:12-17``)
and its env-suffixed table naming (``table_name_with_env``,
``airflow/utils/common.py:115-116``) as Spark catalog databases + a pure
naming helper — no custom metastore, just ``spark.sql`` DDL over parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS = ("src", "ods", "dim", "fact", "mart")

#: Tables the driver's synthetic testdata provides (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_name(layer: str, name: str, env: str | None = None) -> str:
    """``(layer, name, env) -> "layer.name_env"``.

    Reference: BigQuery dataset per layer + ``f"{table_name}_{env}"`` suffix
    (``airflow/utils/common.py:104-116``). ``env=None``/"prod" → no suffix.
    """
    if layer not in LAYERS:
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    env = env if env is not None else os.environ.get("TIBAME_ENV", "")
    suffix = f"_{env}" if env and env != "prod" else ""
    return f"{layer}.{name.replace('-', '_')}{suffix}"


def ensure_layers(spark: SparkSession, location: str | None = None) -> None:
    """Create the five layer databases if absent (idempotent, like the
    reference's dataset bootstrap)."""
    for layer in LAYERS:
        loc = f" LOCATION '{location}/{layer}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}{loc}")


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each testdata parquet as a temp view named after the table.

    Equivalent of the reference's external-table-over-glob bootstrap
    (``airflow/utils/gcp.py:132-201``) for the driver's synthetic tables.
    ``tables`` narrows registration to the views a query actually reads —
    view creation is per-table driver work (schema resolution), so callers
    on a hot path shouldn't pay for ten tables to use one.
    """
    out: dict[str, DataFrame] = {}
    for t in tables if tables is not None else TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            df = load(spark, sf_dir, t)
            df.createOrReplaceTempView(t)
            out[t] = df
    return out


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (schema from parquet footer).

    events.ts is stored as TIMESTAMP(NANOS), which Spark's parquet reader
    cannot represent; with ``nanosAsLong`` it arrives as a bigint of epoch
    nanos and is converted here to a microsecond timestamp (truncation —
    identical to DuckDB's ns→us read of the same file).

    Both required confs are set here at runtime so ``load`` is
    self-sufficient on a *foreign* (vanilla) SparkSession — e.g. the
    driver's harness — not just one built by ``session.get_spark``:

    - ``nanosAsLong`` (runtime-settable legacy conf) keeps the NANOS read
      from dying with PARQUET_TYPE_ILLEGAL;
    - ``session.timeZone=UTC`` makes calendar math over events match the
      naive-UTC semantics of the parquet/DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def table_exists(spark: SparkSession, qualified: str) -> bool:
    """Idempotent-create guard (reference skips existing tables,
    ``airflow/utils/gcp.py:162-165``)."""
    return spark.catalog.tableExists(qualified)


def create_table_as(
    spark: SparkSession,
    qualified: str,
    select_sql: str,
    *,
    partition_by: str | None = None,
    replace: bool = True,
) -> None:
    """CTAS (S9 — ``CREATE OR REPLACE TABLE … PARTITION BY … AS SELECT``,
    ``d_gmaps_fact_reviews.py:36-48``). The v1 session catalog has no atomic
    REPLACE TABLE AS SELECT (that's a v2-catalog feature, e.g. Delta/Iceberg)
    — drop+create reproduces the reference's full-replace semantics."""
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    part = f" PARTITIONED BY ({partition_by})" if partition_by else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {qualified} USING parquet{part} AS {select_sql}"
    )


def drop_table(spark: SparkSession, qualified: str) -> bool:
    """DROP TABLE IF EXISTS (S11 — ``airflow/utils/gcp.py:326-345``);
    returns whether it existed."""
    existed = table_exists(spark, qualified)
    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    return existed


def rename_table(spark: SparkSession, src: str, dst: str) -> None:
    """Rename (S11 — the reference has no native BQ rename and does
    copy+drop, ``airflow/utils/gcp.py:385-445``; Spark's metastore rename is
    atomic for managed tables)."""
    spark.sql(f"ALTER TABLE {src} RENAME TO {dst}")


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ANALYZE-style column profile: (column, n_rows, n_null, n_distinct)
    per profiled column — the stats a planner (or a data steward) wants
    before trusting a new feed. Restricted to counts on purpose: min/max
    would need cross-engine-stable value formatting; counts are integers
    everywhere.

    One aggregation pass over the table (Catalyst expands the multiple
    exact count-distincts into a single Expand + two-stage aggregate), then
    a k-row explode of the wide result — profile cost is one scan
    regardless of how many columns are profiled."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("__e")).select("__e.*")


def analyze_table(
    spark: SparkSession,
    qualified: str,
    *,
    columns: list[str] | None = None,
) -> dict:
    """ANALYZE TABLE: collect table-level (row count, size) and optional
    per-column (NDV, null count, min/max) statistics into the catalog —
    what turns Catalyst's cost-based decisions (broadcast-vs-shuffle join
    selection, join reordering) from file-size guesses into informed ones.
    On a 100 TB warehouse this runs as a scheduled maintenance pass next
    to compaction; a dimension that LOOKS big on disk but has few rows
    only broadcasts if the catalog knows its row count.

    Returns {"statistics": <raw catalog string>, "sizeInBytes": int,
    "rowCount": int | None} parsed from DESCRIBE EXTENDED (rowCount is
    None until a COMPUTE STATISTICS has recorded it; the dict is empty if
    the catalog exposes no Statistics row at all).
    """
    import re

    spark.sql(f"ANALYZE TABLE {qualified} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {qualified} COMPUTE STATISTICS FOR COLUMNS {cols}")
    out: dict = {}
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect():
        if r["col_name"] == "Statistics":
            raw = r["data_type"]
            out["statistics"] = raw
            m = re.search(r"(\d+)\s+bytes", raw)
            out["sizeInBytes"] = int(m.group(1)) if m else None
            m = re.search(r"(\d+)\s+rows", raw)
            out["rowCount"] = int(m.group(1)) if m else None
    return out


def load_snapshot(spark: SparkSession, base_path: str, *, version: int | None = None) -> DataFrame:
    """Read a snapshot-versioned table (``sources.writers.write_snapshot``)
    through the catalog — same contract as :func:`load` for plain parquet:
    the committed head is resolved with ONE directory listing (or an
    explicit ``version`` for time travel within the retention window) and
    crash orphans are never observable. Plans consume snapshot tables with
    this the way they consume managed ones, without importing the writer
    module."""
    from tibame_project_spark.sources.writers import read_snapshot

    return read_snapshot(spark, base_path, version=version)


def register_snapshot(
    spark: SparkSession,
    base_path: str,
    view_name: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """:func:`load_snapshot` + temp-view registration, mirroring
    :func:`register_testdata`'s view contract so SQL-side plans can name a
    snapshot table. The view binds to the version committed AT REGISTRATION
    (the version directory, not the moving head) — re-register to follow
    subsequent commits; readers are never switched mid-query."""
    df = load_snapshot(spark, base_path, version=version)
    df.createOrReplaceTempView(view_name)
    return df


def load_manifest(
    spark: SparkSession,
    base_path: str,
    *,
    version: int | None = None,
    prune: str | None = None,
    tag: str | None = None,
    as_of=None,
) -> DataFrame:
    """Read a manifest-backed table (``sources.manifest``) through the
    catalog — :func:`load_snapshot`'s twin for the incremental-commit
    format: committed head resolved through the shared marker protocol,
    or time travel by ``version``, release ``tag``, or ``as_of`` instant
    (epoch ms / datetime — TIMESTAMP AS OF); optionally file-skipped by a
    ``prune`` expression over the per-file min/max stats (see
    ``sources.manifest.manifest_file_paths`` for the contract)."""
    from tibame_project_spark.sources.manifest import read_manifest_table

    return read_manifest_table(
        spark, base_path, version=version, prune=prune, tag=tag, as_of=as_of
    )


def register_manifest(
    spark: SparkSession,
    base_path: str,
    view_name: str,
    *,
    version: int | None = None,
    prune: str | None = None,
    tag: str | None = None,
    as_of=None,
) -> DataFrame:
    """:func:`load_manifest` + temp-view registration, mirroring
    :func:`register_snapshot`: the view binds to the file list resolved AT
    REGISTRATION — re-register to follow subsequent commits."""
    df = load_manifest(
        spark, base_path, version=version, prune=prune, tag=tag, as_of=as_of
    )
    df.createOrReplaceTempView(view_name)
    return df
