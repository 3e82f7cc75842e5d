"""Bucketed warehouse refresh — the storage tier wired into a real pipeline.

The reference refreshes its dim/fact layers by full WRITE_TRUNCATE rewrites
plus DML patches (UPDATE/INSERT ``create_dim_attraction_hashtag.py:134-191``,
DELETE ``create_dim_attraction_detail.py:123-199``). This plan is that
nightly refresh re-expressed for 100 TB:

* the standing target is a **bucketed managed table** (clustered on the
  merge key at write time — ``sources.writers.write_bucketed_table``), so
  the refresh's MERGE join plans with ZERO hash-partitioning exchanges:
  the clustering shuffle is paid once at bootstrap and never again;
* the nightly batch is staged bucketed on the same (key, bucket count), so
  BOTH merge sides arrive pre-clustered;
* the refresh applies the batch in ONE pass (``operators.corrections.
  merge_upsert`` with ``null_safe_keys=False`` — the flag that keeps the
  join's distribution requirement satisfiable by raw-key bucketing), writes
  the result to a bucketed stage table, and publishes it with the
  metastore's atomic rename — readers see the old table or the new one,
  never a half-written mix;
* optionally the published result is ALSO committed as a
  **snapshot-versioned table** (``write_snapshot``), the artifact
  downstream consumers read through ``catalog.load_snapshot`` /
  ``register_snapshot`` and diff with ``snapshot_changes``.

Plan-asserted end-to-end in
``tests/test_physical_plans.py::test_warehouse_refresh_join_is_exchange_free``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tibame_project_spark.catalog import drop_table, ensure_layers, rename_table
from tibame_project_spark.operators.corrections import merge_upsert
from tibame_project_spark.sources.writers import write_bucketed_table, write_snapshot


def bootstrap_warehouse(
    spark: SparkSession,
    initial: DataFrame,
    *,
    table: str = "fact.wh_customer",
    key: str = "c_custkey",
    buckets: int = 8,
) -> None:
    """Create the standing bucketed target from an initial load. The
    clustering shuffle happens HERE, once; every nightly refresh reuses
    the layout. The key must be non-null (the bucketed merge path uses
    plain equality) — enforce upstream with an expectations rule."""
    ensure_layers(spark)
    write_bucketed_table(initial, table, bucket_by=key, num_buckets=buckets)


def stage_upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    *,
    table: str = "ods.wh_customer_batch",
    key: str = "c_custkey",
    buckets: int = 8,
) -> None:
    """Land the nightly upsert batch bucketed on the SAME (key, bucket
    count) as the target — the batch is tiny next to the target, so its
    clustering write is cheap, and it buys the exchange-free merge."""
    ensure_layers(spark)
    write_bucketed_table(batch, table, bucket_by=key, num_buckets=buckets)


def refresh_warehouse(
    spark: SparkSession,
    *,
    target: str = "fact.wh_customer",
    batch: str = "ods.wh_customer_batch",
    key: str = "c_custkey",
    delete_col: str | None = "is_deleted",
    buckets: int = 8,
    snapshot_path: str | None = None,
) -> DataFrame:
    """One nightly refresh: MERGE the staged batch into the target in one
    full-outer pass (no exchange on either side — both scans are bucketed
    on ``key``), materialize bucketed into ``<target>_stage``, then publish
    via the metastore's atomic rename. When ``snapshot_path`` is given the
    published table is also committed as a snapshot version, so downstream
    consumers get time travel + a change feed for free.

    Returns the published target DataFrame."""
    merged = merge_upsert(
        spark.table(target),
        spark.table(batch),
        key,
        delete_col=delete_col,
        null_safe_keys=False,
    )
    stage = f"{target}_stage"
    # the stage write executes the merge while the old target is still the
    # readable table; the rename below is the publish point
    drop_table(spark, stage)
    write_bucketed_table(merged, stage, bucket_by=key, num_buckets=buckets)
    drop_table(spark, target)
    rename_table(spark, stage, target)
    out = spark.table(target)
    if snapshot_path is not None:
        write_snapshot(spark, out, snapshot_path)
    return out


def merge_plan(
    spark: SparkSession,
    *,
    target: str = "fact.wh_customer",
    batch: str = "ods.wh_customer_batch",
    key: str = "c_custkey",
    delete_col: str | None = "is_deleted",
) -> DataFrame:
    """The refresh's MERGE relation without the write/publish — what the
    physical-plan test inspects for zero Exchange, and what a dry-run
    validation (row-count expectations on the would-be result) consumes."""
    return merge_upsert(
        spark.table(target),
        spark.table(batch),
        key,
        delete_col=delete_col,
        null_safe_keys=False,
    )
