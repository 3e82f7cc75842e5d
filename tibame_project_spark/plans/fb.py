"""FB-posts pipeline: scraped post CSVs → ``attraction_social_article``
serving rows (``sql/init.sql:62-72``).

Reference lifecycle (``fb_scraper/normalization.py``): a driver-side pandas
loop over ``source/postsInformation_<place>_<yyyy-mm-dd>.csv`` files that

1. pulls the place name and REFERENCE DATE out of the filename
   (``normalization.py:8-13`` — the scrape date every relative timestamp
   resolves against),
2. drops noise rows — non-string times, "在線上" live markers, "+N"
   overflow rows (``:23-27``),
3. normalizes the zh relative/absolute ``time`` strings against the
   reference date (``:29-53``),
4. projects to the serving column set with the literal platform tag
   ``'fb'`` (``:57-67`` — note the reference writes the raw string, not
   the md5 id the DDL's FK implies; we reproduce the reference).

Spark-first: the whole loop is one declarative plan — filename columns
via ``input_file_name()`` (so a glob of thousands of scrape files is one
distributed read, no driver loop), the noise filter and date arithmetic as
column expressions (``functions/dates.is_fb_noise`` /
``normalize_fb_date`` — zero UDFs, whole-stage codegen throughout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tibame_project_spark.functions.dates import is_fb_noise, normalize_fb_date

#: Scrape CSV columns (fb_scraper/facebook_scraper.py output;
#: normalization.py:20 reads them positionally by name).
FB_POSTS_SCHEMA = (
    "id string, post_link string, time string, poster_name string, "
    "poster_link string, content string, all_link string, all_text string, "
    "attraction_id string"
)

#: Filename convention the reference parses (normalization.py:8).
_FILENAME_RE = r"postsInformation_(.+?)_(\d{4}-\d{2}-\d{2})\.csv$"


def read_fb_posts(spark: SparkSession, path: str) -> DataFrame:
    """Read one scrape CSV (or a glob of them) with the place and
    reference date lifted from each row's source filename. ``multiLine``
    + quote-escape because post content embeds newlines and quotes;
    ``input_file_name()`` is URL-encoded, so the zh place name is decoded
    after extraction (the date group is plain ASCII either way)."""
    raw = (
        spark.read.schema(FB_POSTS_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    fname = F.input_file_name()
    return raw.withColumn(
        "place", F.url_decode(F.regexp_extract(fname, _FILENAME_RE, 1))
    ).withColumn(
        "ref_date", F.to_date(F.regexp_extract(fname, _FILENAME_RE, 2))
    )


def normalize_fb_posts(raw: DataFrame) -> DataFrame:
    """``normalization.py:18-82`` as one plan: noise rows dropped, the
    ``time`` string resolved against the file's reference date, projected
    onto the ``attraction_social_article`` contract (init.sql:62-72).
    ``raw`` is :func:`read_fb_posts` output (or anything carrying the
    scrape columns plus ``ref_date``)."""
    return raw.filter(~is_fb_noise(F.col("time"))).select(
        "id",
        "attraction_id",
        F.col("poster_name").alias("author"),
        F.col("content").alias("description"),
        F.col("post_link").alias("url"),
        F.lit("fb").alias("source_platform_id"),
        normalize_fb_date(F.col("time"), F.col("ref_date")).alias("created_at"),
    )


def fb_social_articles(spark: SparkSession, path: str) -> DataFrame:
    """End-to-end: scrape CSV glob → serving-shaped article rows — the
    composed plan the reference runs as ``process_all_files()``
    (normalization.py:88-100), minus the per-file driver loop."""
    return normalize_fb_posts(read_fb_posts(spark, path))
