"""Slowly-changing-dimension (type 2) history builds.

The reference rebuilds its dimensions wholesale every run (WRITE_TRUNCATE,
``airflow/dags/gmaps/d_gmaps_dim_places.py:35-49``), which loses attribute
history. This module adds the standard warehouse answer: collapse an
append-only observation stream into validity intervals
(valid_from / valid_to / is_current), so a dimension row's past states stay
queryable — the piece a daily-reloaded star schema needs to become an
auditable one.

Scale: one window partitioned by the dimension key — a single shuffle on the
natural key, no self-join, no driver state. Skewed keys are bounded by the
number of observations per entity, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_observations(
    obs: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Build an SCD-2 history from per-entity attribute observations.

    Consecutive observations with identical ``attr_cols`` merge into one
    interval (change-collapse); each surviving change opens an interval at
    its ``ts_col`` and closes the previous one. ``tie_col`` breaks same-
    timestamp ties deterministically (e.g. a monotonically increasing event
    id), so replays are idempotent. Output: key, attrs, valid_from,
    valid_to (NULL while current), is_current.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # null-safe inequality: a change to/from NULL is still a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    staged = obs.select(
        key_col,
        *attr_cols,
        F.col(ts_col),
        F.col(tie_col),
        (changed | F.row_number().over(w).eqNullSafe(F.lit(1))).alias("__chg"),
    )
    # keep only change rows, then close each interval at the next change
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    return (
        staged.filter("__chg")
        .select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
