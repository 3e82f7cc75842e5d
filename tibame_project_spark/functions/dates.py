"""zh-TW relative-date resolution — the reference's most semantics-heavy scalar.

Two variants exist in the reference:

* ``convertDate`` BigQuery TEMP FUNCTION
  (``airflow/dags/gmaps/d_gmaps_reviews_src_to_ods.py:51-62``): suffix-matched
  units; minutes/hours/days/weeks are TIMESTAMP arithmetic then CAST AS DATE,
  while months/years are DATE arithmetic (calendar-clamped). Numbers are
  SAFE_CASTed — unparseable → NULL.
* the pandas twin for fb posts (``fb_scraper/normalization.py:29-53``).

Both are reproduced here as pure column-expression compositions — no UDF, so
they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _num(col: Column, suffix: str) -> Column:
    """SAFE_CAST(REGEXP_EXTRACT(col, r'(\\d+)\\s*<suffix>') AS INT64) analog.

    Spark's regexp_extract yields '' on no-match; try_cast('') → NULL, which
    matches BigQuery SAFE_CAST(NULL/garbage) → NULL.
    """
    return F.regexp_extract(col, r"(\d+)\s*" + suffix, 1).try_cast("long")


def _minus_minutes(ts: Column, n: Column) -> Column:
    return ts - F.make_dt_interval(F.lit(0), F.lit(0), n.cast("int"), F.lit(0.0))


def _minus_hours(ts: Column, n: Column) -> Column:
    return ts - F.make_dt_interval(F.lit(0), n.cast("int"), F.lit(0), F.lit(0.0))


def _minus_days(ts: Column, n: Column) -> Column:
    return ts - F.make_dt_interval(n.cast("int"), F.lit(0), F.lit(0), F.lit(0.0))


def convert_relative_date(published_at: Column, extracted_at: Column) -> Column:
    """``convertDate(published_at STRING, extracted_at TIMESTAMP) -> DATE``.

    Bit-exact with d_gmaps_reviews_src_to_ods.py:51-62:

    * ``N分鐘前`` / ``N小時前`` / ``N天前`` / ``N週前`` — subtract from the
      extraction *timestamp*, then take the date (so "30小時前" can cross a
      day boundary exactly as TIMESTAMP_SUB does);
    * ``N個月前`` / ``N年前`` — subtract on the extraction *date* with
      calendar clamping (BigQuery DATE_SUB INTERVAL MONTH ≡ Spark
      ``add_months``: 2024-03-31 − 1 month → 2024-02-29);
    * anything else (including a NULL or malformed number) → NULL.

    Match order follows the reference CASE: 分鐘前 before 天前 etc. Note
    ``個月前`` must be tested before ``月前`` would be — we keep the exact
    suffix set the reference uses.
    """
    d = F.to_date(extracted_at)
    return (
        F.when(published_at.endswith("分鐘前"), F.to_date(_minus_minutes(extracted_at, _num(published_at, "分鐘前"))))
        .when(published_at.endswith("小時前"), F.to_date(_minus_hours(extracted_at, _num(published_at, "小時前"))))
        .when(published_at.endswith("週前"), F.to_date(_minus_days(extracted_at, _num(published_at, "週前") * 7)))
        .when(published_at.endswith("個月前"), F.add_months(d, -_num(published_at, "個月前")))
        .when(published_at.endswith("年前"), F.add_months(d, -12 * _num(published_at, "年前")))
        .when(published_at.endswith("天前"), F.to_date(_minus_days(extracted_at, _num(published_at, "天前"))))
        .otherwise(F.lit(None).cast("date"))
    )


def is_fb_noise(time_col: Column) -> Column:
    """Rows the fb normalizer skips: "在線上" markers and "+N" overflow rows
    (``fb_scraper/normalization.py:23-27``)."""
    return time_col.isNull() | time_col.contains("在線上") | time_col.startswith("+")


def normalize_fb_date(time_col: Column, ref_date: Column) -> Column:
    """Pandas twin (``fb_scraper/normalization.py:29-53``) as expressions.

    * ``N天``                → ref_date − N days
    * contains 小时/小時/分鐘 → ref_date
    * contains 年            → strict "%Y年%m月%d日" parse
    * contains 月 and 日     → strip 上午/下午 tail, inject ref year
    * contains 月 only       → inject ref year ("M月D日" without 日 won't
                               parse → NULL, same as the reference's except)
    * otherwise              → ref_date

    The reference wraps parsing in try/except → None; we use ``try_to_date``.
    """
    year_fmt = "y年M月d日"
    day_n = F.regexp_extract(time_col, r"(\d+)\s*天", 1).try_cast("int")
    month_day = F.concat(
        F.year(ref_date).cast("string"),
        F.lit("年"),
        F.regexp_replace(time_col, r"(上午|下午).*$", ""),
    )
    return (
        F.when(time_col.contains("天"), F.date_sub(ref_date, day_n))
        .when(
            time_col.contains("小时") | time_col.contains("小時") | time_col.contains("分鐘"),
            ref_date,
        )
        .when(time_col.contains("年"), F.try_to_date(time_col, year_fmt))
        .when(time_col.contains("月"), F.try_to_date(month_day, year_fmt))
        .otherwise(ref_date)
    )


def quarter_case(month: Column) -> Column:
    """Quarter via the reference's explicit CASE
    (``d_gmaps_dim_time.py:42-47``) — kept literal for bit-exactness with the
    oracle instead of relying on ``F.quarter``."""
    return (
        F.when(month.isin(1, 2, 3), 1)
        .when(month.isin(4, 5, 6), 2)
        .when(month.isin(7, 8, 9), 3)
        .when(month.isin(10, 11, 12), 4)
    )
