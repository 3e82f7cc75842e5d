"""Reshape operators: unpivot/melt, explode, pivot, header-transpose
(SURVEY.md F12/F13/F14/F19).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (F13 — the taipei visitor matrix ``pd.melt``,
    ``transfer_src_taipei_to_ods_taipei.py:74``). Uses the native unpivot
    operator: no shuffle, rows expand in place."""
    return df.unpivot(id_cols, value_cols, var_name, value_name)


def select_positional(df: DataFrame, indices: list[int]) -> DataFrame:
    """P5 positional column select/reorder (pandas ``iloc[:, [1, 0]]``,
    ``generate_attraction_id_taipei_to_bq_external_table.py:66``) — position
    maps to schema order, which IS stable in Spark (unlike row order)."""
    cols = df.columns
    return df.select(*[cols[i] for i in indices])


def explode_delimited(df: DataFrame, col: str, delim: str = "•", out_col: str | None = None) -> DataFrame:
    """Split-and-explode (F11+F12 —
    ``transfer_src_tripadvisor_to_ods_tripadvisor.py:75-76``): one row per
    delimited element, trimmed."""
    out_col = out_col or col
    arr = F.transform(F.split(F.col(col), delim), lambda x: F.trim(x))
    return df.withColumn(out_col, F.explode(arr))


def header_transpose(df: DataFrame, name_row_filter: Column, key_col: str, cols: list[str]) -> DataFrame:
    """First-row-as-mapping-table transpose (F14 —
    ``transfer_src_taipei_to_ods_taipei.py:67-69``): select the header row,
    unpivot its columns into (column_name, value) pairs. Driver-side-tiny by
    construction (one row in, N rows out)."""
    row = df.filter(name_row_filter).limit(1)
    return row.unpivot([], cols, key_col, "value")


def pivot_day_hour(
    df: DataFrame,
    day_col: str,
    hour_col: str,
    value_col: str,
    agg: str = "avg",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """7×24 popularity matrix (F19 — ``populartimes/crawler.py:215-269``):
    groupBy(day).pivot(hour). Hours are enumerated explicitly so the pivot
    skips its extra distinct-values job. ``extra_keys`` prepends grouping
    columns (e.g. place_id for per-place matrices)."""
    keys = [*(extra_keys or []), day_col]
    return df.groupBy(*keys).pivot(hour_col, list(range(24))).agg(
        getattr(F, agg)(value_col)
    )
