"""Gold → serving: project gold-layer relations onto the MySQL serving
contract (``sql/init.sql:1-141``, 15 tables) and load them over JDBC.

The reference materializes its serving layer by hand (pandas → pymysql
row-by-row INSERTs, e.g. ``MySQL/weatherINFO.ipynb`` cell 3); here each
serving table is a DataFrame projection with the exact column set of its
DDL, loaded as one JDBC batch write (``sources/writers.write_jdbc``) — or
incrementally via the foreachBatch streaming sink
(``streaming/incremental.py``) when the gold side is a stream.

Each builder takes gold inputs and returns a DataFrame whose columns match
the serving DDL name-for-name; ``load_serving`` writes any of them. CHAR(32)
ids are md5 surrogates (``functions/keys.py``), matching the reference's
hashlib convention (``airflow/utils/common.py:8-19``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tibame_project_spark.functions.keys import md5_id, surrogate_key


def serving_city(dim_places: DataFrame) -> DataFrame:
    """``city`` (init.sql:1-5): id CHAR(32), name, name_en — distinct cities
    observed in dim_places; the md5 of the zh name is the id."""
    return (
        dim_places.select(F.col("city").alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .select(
            md5_id(F.col("name")).alias("id"),
            "name",
            F.upper(F.col("name")).alias("name_en"),
        )
    )


def serving_attraction(dim_places: DataFrame) -> DataFrame:
    """``attraction`` (init.sql:29-41): one row per place; googlemap_name /
    googlemap_url from the gmaps dim, city_id the md5 of the city name."""
    return dim_places.select(
        md5_id(F.col("place_name")).alias("attraction_id"),
        F.col("place_name").alias("name"),
        F.lit(None).cast("string").alias("name_en"),
        F.lit(None).cast("string").alias("intro"),
        F.col("place_name").alias("googlemap_name"),
        F.col("google_place_url").alias("googlemap_url"),
        F.lit(None).cast("string").alias("photo_url"),
        md5_id(F.col("city")).alias("city_id"),
        F.col("latitude").cast("decimal(8,6)").alias("lat"),
        F.col("longitude").cast("decimal(9,6)").alias("lon"),
    ).distinct()


def serving_attraction_review(fact_reviews: DataFrame, platform: str = "googlemap") -> DataFrame:
    """``attraction_review`` (init.sql:49-60): review facts keyed by a
    (platform, review_id) surrogate; created_at from the resolved date."""
    return fact_reviews.select(
        surrogate_key(F.lit(platform), F.col("review_id")).alias("id"),
        md5_id(F.col("place_name")).alias("attraction_id"),
        F.col("user_name").alias("author"),
        F.col("rating").cast("float").alias("rating"),
        F.col("review_text").alias("description"),
        md5_id(F.lit(platform)).alias("source_platform_id"),
        F.col("published_at").cast("timestamp").alias("created_at"),
        F.lit(None).cast("string").alias("url"),
    )


def serving_attraction_type(trip_ods: DataFrame) -> DataFrame:
    """``attraction_type`` + ``type`` (init.sql:7-10, 92-98): explode the
    tripadvisor category array into the M:N bridge; returns
    (bridge, type_dim)."""
    exploded = trip_ods.select(
        "attraction_id", F.explode("categories").alias("type_name")
    ).distinct()
    bridge = exploded.select(
        "attraction_id", md5_id(F.col("type_name")).alias("type_id")
    ).distinct()
    type_dim = exploded.select(
        md5_id(F.col("type_name")).alias("id"), F.col("type_name").alias("name")
    ).distinct()
    return bridge, type_dim


def serving_attraction_popularity(
    popular_long: DataFrame, snapshot_ts: str
) -> DataFrame:
    """``attraction_popularity`` (init.sql:83-90): hourly crowding rows from
    the populartimes long relation (``plans/gmaps.popular_times_long``)."""
    return popular_long.select(
        surrogate_key(
            F.col("place_id"), F.col("day"), F.col("hour"), F.lit(snapshot_ts)
        ).alias("id"),
        md5_id(F.col("place_id")).alias("attraction_id"),
        F.col("popularity").cast("int").alias("value"),
        F.col("hour").cast("int").alias("hour"),
        F.lit(snapshot_ts).cast("timestamp").alias("created_at"),
    )


def serving_attraction_history(fact_history: DataFrame) -> DataFrame:
    """``attraction_history`` (init.sql:74-81): monthly visitor counts —
    the gold fact already carries the contract columns."""
    return fact_history.select(
        "attraction_id",
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        F.col("number_people").cast("int").alias("number_people"),
    )


def serving_type(trip_ods: DataFrame) -> DataFrame:
    """``type`` (init.sql:7-10): the category dimension alone — the
    type-dim leg of :func:`serving_attraction_type` for callers loading
    the dim without the bridge (the reference's create_dim_type.py runs
    them as separate DAGs)."""
    _, type_dim = serving_attraction_type(trip_ods)
    return type_dim


def serving_social_platform(spark, platforms: tuple[str, ...] = ("googlemap", "fb")) -> DataFrame:
    """``social_platform`` (init.sql:12-15): the two platforms the
    reference ingests (gmaps reviews, fb posts). md5-of-name ids, same
    convention as every other CHAR(32) dim."""
    from tibame_project_spark.localdf import local_rows_df

    df = local_rows_df(spark, [(p,) for p in platforms], "name string")
    return df.select(md5_id(F.col("name")).alias("id"), "name")


def serving_weather_station(stations: DataFrame) -> DataFrame:
    """``weather_station`` (init.sql:17-27): station registry projection.
    ``stations`` carries station_orig_id, name, name_en, lat, lon, city,
    address (the CWA station list; the monthly reports' station metadata
    joins on station_orig_id). DECIMAL(8,6)/(9,6) per the DDL."""
    return stations.select(
        md5_id(F.col("station_orig_id")).alias("id"),
        "station_orig_id",
        "name",
        "name_en",
        F.col("lat").cast("decimal(8,6)").alias("lat"),
        F.col("lon").cast("decimal(9,6)").alias("lon"),
        md5_id(F.col("city")).alias("city_id"),
        "address",
    )


def serving_attraction_hashtag(taipei_ids: DataFrame, trip_ods: DataFrame,
                               trip_ids: DataFrame) -> DataFrame:
    """``attraction_hashtag`` (init.sql:137-141): the name-synonym lookup.
    Reference (create_dim_attraction_hashtag.py:87-93):
    ``SELECT name, attraction_id FROM ods_attraction_generate_id_taipei
    UNION DISTINCT SELECT DISTINCT name, attraction_id FROM
    ods_tripadvisor JOIN ods_attraction_generate_id_trip USING (name)``.
    Both sides are (name, attraction_id) relations; the id sides are tiny
    lookup tables, so the join broadcasts."""
    trip_named = (
        trip_ods.select("name")
        .join(F.broadcast(trip_ids.select("name", "attraction_id")), "name")
        .distinct()
    )
    return (
        taipei_ids.select("name", "attraction_id")
        .unionByName(trip_named)
        .distinct()
    )


def serving_attraction_detail(hashtags: DataFrame, trip_ods: DataFrame) -> DataFrame:
    """``attraction_detail`` (init.sql:43-47) — reference
    (create_dim_attraction_detail.py:78-83): ``SELECT DISTINCT
    attraction_id, info, photo_url FROM dim_attraction_hashtag LEFT JOIN
    ods_tripadvisor USING (name)``; the serving DDL keeps
    (attraction_id, info), photo_url folds into ``attraction``. The
    hashtag synonym table is the join spine so every name variant
    resolves to the same detail row."""
    return (
        hashtags.join(
            trip_ods.select("name", "info"), "name", "left"
        )
        .select("attraction_id", "info")
        .distinct()
    )


def serving_attraction_social_article(normalized_posts: DataFrame) -> DataFrame:
    """``attraction_social_article`` (init.sql:62-72): the fb pipeline's
    product — :func:`plans.fb.normalize_fb_posts` already lands on the
    contract; this projection pins the DDL column order and DATE type."""
    return normalized_posts.select(
        "id",
        "attraction_id",
        "author",
        "description",
        "url",
        "source_platform_id",
        F.col("created_at").cast("date").alias("created_at"),
    )


def serving_weather_daily(observations: DataFrame) -> DataFrame:
    """``weather_daily`` (init.sql:114-122): current-day station readings.
    The reference declares the DDL but commits no population code (the
    daily scrape never landed); inputs here are a generic daily
    observation relation: station_orig_id, temperature_low/high/avg,
    description, obs_date."""
    return observations.select(
        surrogate_key(F.col("station_orig_id"), F.col("obs_date")).alias("id"),
        md5_id(F.col("station_orig_id")).alias("station_id"),
        F.col("temperature_low").cast("int").alias("temperature_low"),
        F.col("temperature_high").cast("int").alias("temperature_high"),
        F.col("temperature_avg").cast("int").alias("temperature_avg"),
        "description",
        F.col("obs_date").cast("date").alias("current_date"),
    )


def serving_weather_prediction(forecast: DataFrame) -> DataFrame:
    """``weather_prediction`` (init.sql:125-135): 7-day forecast rows.
    Like weather_daily, DDL-only in the reference; inputs: a forecast
    relation with station_orig_id, temperature_low/high/avg, rain_prob,
    prediction_date, fetched_at. The id keys (station, target-date,
    fetch-time) so re-fetches version rather than collide."""
    return forecast.select(
        surrogate_key(
            F.col("station_orig_id"), F.col("prediction_date"), F.col("fetched_at")
        ).alias("id"),
        md5_id(F.col("station_orig_id")).alias("station_id"),
        F.col("temperature_low").cast("int").alias("temperature_low"),
        F.col("temperature_high").cast("int").alias("temperature_high"),
        F.col("temperature_avg").cast("int").alias("temperature_avg"),
        F.col("rain_prob").cast("int").alias("rainfall"),
        F.col("prediction_date").cast("date").alias("prediction_date"),
        F.col("fetched_at").cast("timestamp").alias("create_at"),
    )


def load_serving(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    *,
    mode: str = "append",
) -> None:
    """One JDBC batch write per serving table (vs the reference's per-row
    cursor.execute loop)."""
    from tibame_project_spark.sources.writers import write_jdbc

    write_jdbc(df, url, table, mode=mode, properties=properties)
