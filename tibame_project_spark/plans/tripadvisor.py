"""TripAdvisor src → ods: the reference's 8-stage pandas/XCom task chain
(``d_tripadvisor_src_to_ods.py:136-157``) as ONE lazy expression.

Each reference @task boundary serialized the whole frame through XCom; here
Catalyst collapses the chain into a single scan-project-filter (SURVEY.md
§3.2).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tibame_project_spark.functions.keys import md5_id
from tibame_project_spark.functions.text import parse_rating, split_delimited
from tibame_project_spark.operators.dedup import dedup_subset

RENAMES = {
    # crawler → canonical (d_tripadvisor_src_to_ods.py:51-63)
    "名稱": "attraction_name",
    "評分": "rating",
    "類別": "categories",
    "地址": "address",
    "totalReviews": "total_reviews",
}


def ods_tripadvisor(src: DataFrame, renames: dict[str, str] | None = None) -> DataFrame:
    """remove-unnamed → rename → dropna(all) → dedup → parse rating →
    drop total_reviews → categories to array → md5 attraction_id."""
    renames = renames or RENAMES
    keep = [c for c in src.columns if not re.match(r"^Unnamed", c)]  # :45-48
    df = src.select(*keep)
    df = df.withColumnsRenamed({k: v for k, v in renames.items() if k in df.columns})
    df = df.na.drop("all")  # :66-67
    df = dedup_subset(df, ["attraction_name", "rating"])  # :70-71
    df = df.withColumn("rating", parse_rating(F.col("rating")))  # :74-81
    if "total_reviews" in df.columns:  # :84-87
        df = df.drop("total_reviews")
    df = df.withColumn("categories", split_delimited(F.col("categories"), "•"))  # :90-97
    df = df.withColumn("attraction_id", md5_id(F.col("attraction_name")))  # :100-104
    return df.select("attraction_id", "attraction_name", "rating", "categories", "address")
