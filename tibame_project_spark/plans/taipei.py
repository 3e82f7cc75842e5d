"""Taipei visitor-count src → ods: wide matrix → long table.

Reference (``transfer_src_taipei_to_ods_taipei.py:60-90``): drop the zh
header row, pull (zh, en) name mapping from it, parse "104(2015)" ROC years,
melt one-column-per-attraction into (year, month, name, number_people).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tibame_project_spark.functions.text import parse_paren_year
from tibame_project_spark.operators.reshape import melt


def name_mapping(src: DataFrame, id_cols: list[str]) -> DataFrame:
    """F14 header transpose: the first (zh-name) row becomes a
    (name_en, name_zh) mapping table. The zh header row is identified by
    content (year column not parseable), not position — Spark has no stable
    row order."""
    attraction_cols = [c for c in src.columns if c not in id_cols]
    header = src.filter(parse_paren_year(F.col(id_cols[0])).isNull()).limit(1)
    return header.unpivot([], attraction_cols, "name_en", "name_zh")


def ods_taipei(src: DataFrame, year_col: str = "year", month_col: str = "month") -> DataFrame:
    """Melt + clean: rows with parseable "ROC(AD)" years survive (this also
    drops the zh header row the reference dropped positionally via
    ``drop([0])`` — content predicate replaces positional drop), values
    coerced to long with NULL-on-failure then dropped."""
    attraction_cols = [c for c in src.columns if c not in (year_col, month_col)]
    long = melt(src, [year_col, month_col], attraction_cols, "name", "number_people")
    return (
        long.withColumn("year", parse_paren_year(F.col(year_col)))
        .filter(F.col("year").isNotNull())
        .withColumn("month", F.col(month_col).try_cast("int"))
        .filter(F.col("month").isNotNull())  # where month is not null (create_fact_attraction_history.py:82)
        .withColumn("number_people", F.regexp_replace(F.col("number_people"), ",", "").try_cast("long"))
        .na.drop(subset=["number_people"])
        .select("year", "month", "name", "number_people")
    )
