"""Join operators (SURVEY.md §2.4): equi / left-chain / star / anti / fuzzy.

Scale stance: dims are broadcast (explicitly via ``F.broadcast`` for the ones
we know are small — dim_time, dim_places-scale lookups — and via AQE for the
rest); the fact side never moves except for the final aggregation shuffle.
The fuzzy join has two tiers: exact-window top-1 (small dim) and a blocked
variant for scale (see dedup.minhash for the LSH machinery it reuses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, Column | str]], broadcast_dims: bool = True) -> DataFrame:
    """Fact × N dims (J5 — ``d_gmaps_mart_review_trends.py:86-93``). Each dim
    is inner-joined on its condition; small dims are broadcast so the fact
    table streams through N broadcast-hash joins without a shuffle."""
    out = fact
    for dim, cond in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, cond, "inner")
    return out


def left_join_chain(base: DataFrame, steps: list[tuple[DataFrame, Column | str]]) -> DataFrame:
    """Chained LEFT joins (J3/J4 — ``create_dim_attraction_type.py:88-96``)."""
    out = base
    for right, cond in steps:
        out = out.join(right, cond, "left")
    return out


def anti_join(new: DataFrame, existing: DataFrame, key: str | list[str]) -> DataFrame:
    """NOT IN subquery as LEFT ANTI (J7 —
    ``create_dim_attraction_hashtag.py:187-190``). Catalyst's
    RewritePredicateSubquery produces exactly this plan for NOT IN on
    non-nullable keys."""
    return new.join(existing, key, "left_anti")


def lookup_join(df: DataFrame, dim: DataFrame, key: str | list[str], how: str = "left") -> DataFrame:
    """Broadcast lookup join (J8) — the reference does this as a driver-side
    Python dict (``fb_scraper/facebook_scraper.py:23-25,122``); here it's a
    real broadcast-hash join so it distributes."""
    return df.join(F.broadcast(dim), key, how)


def fuzzy_top1_join(
    df: DataFrame,
    dim: DataFrame,
    left_col: str,
    right_col: str,
    *,
    id_cols: list[str] | None = None,
    max_distance: int | None = None,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Best-fuzzy-match join (J9 — ``airflow/utils/common.py:22-28``'s
    fuzzywuzzy.extractOne): for every left row, the dim row with minimum
    Levenshtein distance to ``left_col``.

    Physical shape: broadcast cross join (dim must be broadcast-sized — the
    reference's dim is ~600 names) + per-left-row window top-1 with
    deterministic tie-break on the match string. For dims too large to
    broadcast, use operators.dedup.minhash machinery to block candidates
    first (LSH), then apply the same window.
    """
    id_cols = id_cols or [c for c in dim.columns if c != right_col]
    dist = F.levenshtein(F.col("__l"), F.col(right_col))
    out = (
        df.withColumn("__l", F.col(left_col))
        .crossJoin(F.broadcast(dim))
        .withColumn("__dist", dist)
    )
    if max_distance is not None:
        out = out.filter(F.col("__dist") <= max_distance)
    order = [F.col("__dist"), F.col(right_col)] + [F.col(c) for c in (tie_break or [])]
    w = Window.partitionBy("__l").orderBy(*order)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__l")
    )
