"""Partitioning utilities — the engine's explicit handle on parallelism.

Spark's scan parallelism is bounded by file splits (row-group granularity for
parquet). A single-row-group file therefore yields ONE task no matter how
many cores exist — catastrophic for compute-dense operators (levenshtein
cross joins, sketching, per-row feature extraction) whose cost is per-row
CPU, not IO. ``ensure_parallelism`` repartitions only when the input is
under-split: on a 100 TB table with thousands of row groups it is a no-op;
on a small single-file input it unlocks full-cluster parallelism for the
CPU-bound stage that follows (a round-robin shuffle of a small input is
noise next to the compute it parallelizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to at least ``min_parts`` (default: the session's
    shuffle parallelism) if — and only if — its current plan has fewer
    partitions. Use directly upstream of CPU-dense per-row operators."""
    spark = df.sparkSession
    if min_parts is None:
        min_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
