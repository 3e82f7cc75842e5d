"""DML-style corrections as data (SURVEY.md §2.10).

The reference patches its dims with hand-written UPDATE / DELETE / INSERT
batches run against BigQuery (13 UPDATEs
``create_dim_attraction_hashtag.py:134-186``; 19 DELETEs
``create_dim_attraction_detail.py:123-199``; INSERT-NOT-IN ``:187-190``).
A pure-batch engine reproduces those declaratively: corrections are
DataFrames, applied with joins, and the result overwrites the table — no
mutable storage required (Delta Lake could swap in later without changing
call sites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_updates(df: DataFrame, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """UPDATE … SET col=… WHERE key=… (M1).

    ``updates`` carries the key column(s) plus the new values for any subset
    of df's columns; non-keyed rows pass through, matched rows take the
    corrected value where it is non-null (coalesce semantics).
    """
    keys = [key] if isinstance(key, str) else key
    upd_cols = [c for c in updates.columns if c not in keys]
    renamed = updates.select(
        *[F.col(k) for k in keys], *[F.col(c).alias(f"__new_{c}") for c in upd_cols]
    )
    out = df.join(F.broadcast(renamed), keys, "left")
    for c in upd_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop(*[f"__new_{c}" for c in upd_cols])


def apply_deletes(df: DataFrame, deletes: DataFrame, key: str | list[str]) -> DataFrame:
    """DELETE WHERE key IN (…) (M2) — anti-join against the deletion set."""
    return df.join(F.broadcast(deletes), key, "left_anti")


def insert_missing(existing: DataFrame, incoming: DataFrame, key: str | list[str]) -> DataFrame:
    """INSERT … SELECT … WHERE key NOT IN (existing) (M3) — upsert-lite:
    append only rows whose key is absent, by name."""
    new_rows = incoming.join(existing.select(*( [key] if isinstance(key, str) else key )), key, "left_anti")
    return existing.unionByName(new_rows, allowMissingColumns=False)
