"""The flagship gmaps review pipeline: src → ods → dim/fact → mart.

Reference lifecycle (SURVEY.md §3.1): crawler JSONL/parquet → external table →
``convertDate`` CTAS (``d_gmaps_reviews_src_to_ods.py:50-80``) → three
DISTINCT CTAS dims/facts (``d_gmaps_dim_time.py``, ``d_gmaps_dim_users.py``,
``d_gmaps_fact_reviews.py``) → star-join mart
(``d_gmaps_mart_review_trends.py:71-106``). In the reference every hop is a
cross-process Airflow boundary with sensors; here each stage is a lazy
DataFrame, and Catalyst sees the whole lineage at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tibame_project_spark.functions.dates import convert_relative_date, quarter_case
from tibame_project_spark.functions.text import extract_city, extract_region
from tibame_project_spark.operators.joins import star_join


def ods_reviews(src: DataFrame) -> DataFrame:
    """src → ods (``d_gmaps_reviews_src_to_ods.py:50-80``): resolve the zh
    relative date against extraction time, project, drop incomplete rows.
    Write partitioned by published_at (PARTITION BY in the reference CTAS)."""
    return src.filter(
        F.col("place_name").isNotNull()
        & F.col("review_id").isNotNull()
        & F.col("published_at").isNotNull()
    ).select(
        "place_name",
        "review_id",
        "rating",
        "review_text",
        convert_relative_date(F.col("published_at"), F.col("extracted_at").cast("timestamp")).alias(
            "published_at"
        ),
        "user_name",
        "user_url",
    )


def dim_time(ods: DataFrame, date_col: str = "published_at") -> DataFrame:
    """``d_gmaps_dim_time.py:35-50``: DISTINCT dates with year/month/day and
    the CASE quarter."""
    d = F.col(date_col)
    return ods.select(
        d.alias("date"),
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        quarter_case(F.month(d)).alias("quarter"),
    ).distinct()


def dim_users(ods: DataFrame) -> DataFrame:
    """``d_gmaps_dim_users.py:35-41``: DISTINCT (user_name, user_url)."""
    return ods.select("user_name", "user_url").distinct()


def dim_places(ods_places: DataFrame) -> DataFrame:
    """``d_gmaps_dim_places.py:35-49``: DISTINCT place attributes with
    city/region regex-split from the nested address state. Consumes the
    full-fidelity GMAPS_PLACES ods shape (schemas.py) name-for-name."""
    return ods_places.select(
        "place_id",
        "place_name",
        F.col("detailed_address.country_code").alias("country"),
        extract_city(F.col("detailed_address.state")).alias("city"),
        extract_region(F.col("detailed_address.state")).alias("region"),
        F.col("coordinates.latitude").alias("latitude"),
        F.col("coordinates.longitude").alias("longitude"),
        "address",
        "google_place_url",
        "main_category",
    ).distinct()


_DAYS = ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")


def popular_times_long(ods_places: DataFrame) -> DataFrame:
    """GMAPS_PLACES.popular_times (7 per-day histogram arrays) → long rows
    (place_id, day, hour, popularity). The relational form of the crawler's
    7×24 zero-initialized matrix fill (``populartimes/crawler.py:215-269``):
    stack the day structs, explode the histograms — absent hours are simply
    absent rows (densified to 0 by ``popular_times_matrix``)."""
    stacked = ods_places.select(
        "place_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("day"),
                        F.col(f"popular_times.{d}").alias("entries"),
                    )
                    for d in _DAYS
                ]
            )
        ).alias("__d"),
    )
    return (
        stacked.select("place_id", F.col("__d.day").alias("day"), F.explode("__d.entries").alias("__e"))
        .select(
            "place_id",
            "day",
            F.col("__e.hour_of_day").alias("hour"),
            F.col("__e.popularity_percentage").alias("popularity"),
        )
    )


def popular_times_matrix(ods_places: DataFrame) -> DataFrame:
    """Per-place 7×24 matrix (F19 end-to-end): explode → pivot over the
    enumerated 24 hours → missing cells filled with 0, exactly the
    crawler's ``[[0]*24 for _ in range(7)]`` initialization."""
    from tibame_project_spark.operators.reshape import pivot_day_hour

    mat = pivot_day_hour(
        popular_times_long(ods_places),
        "day",
        "hour",
        "popularity",
        agg="first",
        extra_keys=["place_id"],
    )
    return mat.fillna(0, subset=[str(h) for h in range(24)])


def fact_reviews(ods: DataFrame) -> DataFrame:
    """``d_gmaps_fact_reviews.py:36-48``: DISTINCT review facts, partitioned
    by published_at on write."""
    return ods.select(
        "review_id", "place_name", "rating", "review_text", "published_at", "user_name"
    ).distinct()


def mart_review_trends(fact: DataFrame, places: DataFrame, time: DataFrame) -> DataFrame:
    """``d_gmaps_mart_review_trends.py:71-106``: fact × dim_places ×
    dim_time, 11-key group, COUNT(review_id) + ROUND(AVG(rating),2).

    dims are broadcast — the fact table never shuffles for the joins, only
    for the final aggregation (partial agg map-side first)."""
    joined = star_join(
        fact,
        [
            (places, fact["place_name"] == places["place_name"]),
            (time, fact["published_at"] == time["date"]),
        ],
    )
    keys = [
        places["city"],
        places["region"],
        places["place_id"],
        places["place_name"],
        places["main_category"],
        places["latitude"],
        places["longitude"],
        time["year"],
        time["month"],
        time["quarter"],
        time["date"],
    ]
    return joined.groupBy(*keys).agg(
        F.count(fact["review_id"]).alias("total_reviews"),
        F.round(F.avg(fact["rating"]), 2).alias("avg_rating"),
    )
