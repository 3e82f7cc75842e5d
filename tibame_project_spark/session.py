"""SparkSession factory with scale-oriented defaults.

The reference delegates execution to BigQuery + pandas and hand-batches
parallelism (Airflow ``.expand`` fan-out in groups of 200,
``airflow/dags/gmaps/d_gmaps_crawler_to_src.py:52-56``). Here a single tuned
SparkSession replaces all of that: AQE handles runtime re-planning (partition
coalescing, skew-join splitting, broadcast conversion), dynamic partition
overwrite gives the reference's idempotent day-partitioned reloads
(``airflow/utils/gcp.py:283-289``), and Arrow is enabled for the few
pandas-UDF surfaces.

Session timezone is pinned to UTC so calendar functions (year/quarter/…) are
deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that matter at 100 TB just as much as on local[32].
SCALE_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast when the built side turns
    # out small. This is the engine's answer to the reference's hand-tuned
    # batch sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic calendar math (matches DuckDB's naive timestamps).
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs / toPandas — the only sanctioned
    # Python<->JVM data path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Idempotent day-partitioned reloads: only the partitions present in the
    # incoming batch are replaced (reference re-writes {date}/ blob dirs).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Read timestamp[ms|us|ns] parquet (isAdjustedToUTC=false) as TIMESTAMP_NTZ
    # so calendar extraction is storage-faithful.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # Spark's parquet reader rejects TIMESTAMP(NANOS) outright; read nanos as
    # LongType and convert at the catalog boundary (catalog.load) instead.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.compression.codec": "snappy",
}


def get_spark(
    app_name: str = "tibame-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` defaults to the local core count — right for
    local[N] testing; a real cluster deployment overrides it (or relies on
    AQE coalescing from a higher initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(SCALE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local-mode niceties; harmless on a cluster where these are set
    # externally. 24g: local[32] runs 32 concurrent tasks in the driver JVM —
    # an undersized heap turns persist()+wide joins into GC storms (observed
    # as 10x run-to-run swings on otherwise sub-second queries).
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
