"""Declared schemas — schema-on-write, like the reference's BigQuery loads.

The reference declares explicit BQ schemas for every curated table (e.g. the
deeply nested gmaps-places schema,
``airflow/dags/gmaps/d_gmaps_places_src_to_ods.py:147-390``) and requires a
schema for CSV external tables (``airflow/utils/gcp.py:173-177``). We do the
same with StructTypes: engine paths always pass an explicit schema; inference
is reserved for raw/src ingestion.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# gmaps reviews (src layer) — reference schema at
# d_gmaps_reviews_src_to_ods.py:66-79 (projected columns) + raw crawler output.
# ---------------------------------------------------------------------------
GMAPS_REVIEWS_SRC = T.StructType(
    [
        _f("place_name", T.StringType()),
        _f("review_id", T.StringType()),
        _f("rating", T.DoubleType()),
        _f("review_text", T.StringType()),
        _f("published_at", T.StringType()),  # zh relative date, e.g. "3 天前"
        _f("extracted_at", T.TimestampType()),
        _f("user_name", T.StringType()),
        _f("user_url", T.StringType()),
    ]
)

# ods layer: published_at resolved to a DATE (partition column).
GMAPS_REVIEWS_ODS = T.StructType(
    [
        _f("place_name", T.StringType()),
        _f("review_id", T.StringType()),
        _f("rating", T.DoubleType()),
        _f("review_text", T.StringType()),
        _f("published_at", T.DateType()),
        _f("user_name", T.StringType()),
        _f("user_url", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# gmaps places — the deep nested schema (3-level arrays-of-structs), declared
# at full fidelity against the reference's BQ schema,
# d_gmaps_places_src_to_ods.py:147-390: every field, name-for-name, in
# reference order (BQ INTEGER→long, FLOAT→double, REPEATED→array).
# ---------------------------------------------------------------------------
_COORDINATES = T.StructType([_f("latitude", T.DoubleType()), _f("longitude", T.DoubleType())])
_DETAILED_ADDRESS = T.StructType(
    [
        _f("ward", T.StringType()),
        _f("street", T.StringType()),
        _f("city", T.StringType()),
        _f("postal_code", T.StringType()),
        _f("state", T.StringType()),
        _f("country_code", T.StringType()),
    ]
)
_REVIEW_KEYWORD = T.StructType([_f("keyword", T.StringType()), _f("count", T.LongType())])
_ABOUT_OPTION = T.StructType([_f("name", T.StringType()), _f("enabled", T.BooleanType())])
_ABOUT = T.StructType(
    [_f("id", T.StringType()), _f("name", T.StringType()), _f("options", T.ArrayType(_ABOUT_OPTION))]
)
_IMAGE = T.StructType([_f("about", T.StringType()), _f("link", T.StringType())])
_HOURS = T.StructType([_f("day", T.StringType()), _f("times", T.ArrayType(T.StringType()))])
#: link + source pair (menu / reservations / order_online_links)
_LINK_SOURCE = T.StructType([_f("link", T.StringType()), _f("source", T.StringType())])
_MOST_POPULAR = T.StructType(
    [
        _f("hour_of_day", T.LongType()),
        _f("average_popularity", T.DoubleType()),
        _f("time_label", T.StringType()),
    ]
)
#: per-day popularity histogram entry (popular_times.Monday…Sunday elements)
_POPULAR_DAY = T.ArrayType(
    T.StructType(
        [
            _f("hour_of_day", T.LongType()),
            _f("time_label", T.StringType()),
            _f("popularity_percentage", T.LongType()),
            _f("popularity_description", T.StringType()),
        ]
    )
)
_POPULAR_TIMES = T.StructType([_f(d, _POPULAR_DAY) for d in
                               ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")])
_REVIEWS_PER_RATING = T.StructType([_f(f"rating_{i}", T.LongType()) for i in range(1, 6)])

GMAPS_PLACES = T.StructType(
    [
        _f("place_id", T.StringType(), nullable=False),
        _f("place_id_raw", T.StringType(), nullable=False),
        _f("place_name", T.StringType(), nullable=False),
        _f("description", T.StringType()),
        _f("total_reviews", T.LongType()),
        _f("avg_rating", T.DoubleType()),
        _f("can_claim", T.BooleanType()),
        _f("featured_image", T.StringType()),
        _f("main_category", T.StringType()),
        _f("categories", T.ArrayType(T.StringType())),
        _f("google_place_url", T.StringType(), nullable=False),
        _f("workday_timing", T.StringType()),
        _f("address", T.StringType()),
        _f("review_keywords", T.ArrayType(_REVIEW_KEYWORD)),
        _f("link", T.StringType()),
        _f("status", T.StringType()),
        _f("price_range", T.StringType()),
        _f("reviews_link", T.StringType()),
        _f("reviews_per_rating", _REVIEWS_PER_RATING),
        _f("coordinates", _COORDINATES),
        _f("detailed_address", _DETAILED_ADDRESS),
        _f("time_zone", T.StringType()),
        _f("menu", _LINK_SOURCE),
        _f("reservations", T.ArrayType(_LINK_SOURCE)),
        _f("order_online_links", T.ArrayType(_LINK_SOURCE)),
        _f("about", T.ArrayType(_ABOUT)),
        _f("images", T.ArrayType(_IMAGE)),
        _f("hours", T.ArrayType(_HOURS)),
        _f("most_popular_times", T.ArrayType(_MOST_POPULAR)),
        _f("popular_times", _POPULAR_TIMES),
        _f("is_spending_on_ads", T.BooleanType()),
    ]
)

# ---------------------------------------------------------------------------
# tripadvisor / taipei / fb — cleaned ods shapes
# (d_tripadvisor_src_to_ods.py:116-134, transfer_src_taipei_to_ods_taipei.py,
#  fb_scraper/normalization.py:70-83)
# ---------------------------------------------------------------------------
TRIPADVISOR_ODS = T.StructType(
    [
        _f("attraction_id", T.StringType(), nullable=False),
        _f("attraction_name", T.StringType()),
        _f("rating", T.DoubleType()),
        _f("categories", T.ArrayType(T.StringType())),
        _f("address", T.StringType()),
    ]
)

TAIPEI_ODS = T.StructType(
    [
        _f("year", T.IntegerType()),
        _f("month", T.IntegerType()),
        _f("name", T.StringType()),
        _f("number_people", T.LongType()),
    ]
)

FB_POSTS = T.StructType(
    [
        _f("id", T.StringType()),
        _f("attraction_id", T.StringType()),
        _f("poster_name", T.StringType()),
        _f("content", T.StringType()),
        _f("post_link", T.StringType()),
        _f("source", T.StringType()),
        _f("published_at", T.DateType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload + typed metadata (engine extension; the
# decode itself is stubbed — see sources/multimodal.py).
# ---------------------------------------------------------------------------
MEDIA = T.StructType(
    [
        _f("media_id", T.StringType(), nullable=False),
        _f("kind", T.StringType()),  # image | audio | video
        _f("content", T.BinaryType()),
        _f(
            "meta",
            T.StructType(
                [
                    _f("mime", T.StringType()),
                    _f("width", T.IntegerType()),
                    _f("height", T.IntegerType()),
                    _f("duration_ms", T.LongType()),
                    _f("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)
