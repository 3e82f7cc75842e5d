"""Property-based tests (hypothesis): the semantics-heavy scalars hold for
arbitrary inputs, not just the fixtures — zh relative dates against a pure
Python model of the reference's convertDate, and melt/pivot inverses."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from tibame_project_spark.functions.dates import convert_relative_date

UNITS = ["分鐘前", "小時前", "天前", "週前", "個月前", "年前", "junk"]


def _model(n: int, unit: str, ts: dt.datetime) -> dt.date | None:
    """Pure-Python twin of the reference's convertDate
    (d_gmaps_reviews_src_to_ods.py:51-62)."""
    if unit == "分鐘前":
        return (ts - dt.timedelta(minutes=n)).date()
    if unit == "小時前":
        return (ts - dt.timedelta(hours=n)).date()
    if unit == "天前":
        return (ts - dt.timedelta(days=n)).date()
    if unit == "週前":
        return (ts - dt.timedelta(days=7 * n)).date()
    if unit == "個月前":
        # month arithmetic on the DATE, clamped to month end (BQ DATE_SUB)
        d = ts.date()
        m = d.year * 12 + (d.month - 1) - n
        y, mo = divmod(m, 12)
        last = (dt.date(y + (mo + 1) // 12, (mo + 1) % 12 + 1, 1) - dt.timedelta(days=1)
                ) if mo != 11 else dt.date(y + 1, 1, 1) - dt.timedelta(days=1)
        return dt.date(y, mo + 1, min(d.day, last.day))
    if unit == "年前":
        d = ts.date()
        try:
            return d.replace(year=d.year - n)
        except ValueError:  # Feb 29 → Feb 28
            return d.replace(year=d.year - n, day=28)
    return None


# one Spark round-trip per case batch keeps this fast
@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=120),
            st.sampled_from(UNITS),
            st.datetimes(
                min_value=dt.datetime(1990, 1, 5),
                max_value=dt.datetime(2035, 12, 28),
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_relative_date_matches_model(spark_global, cases):
    rows = [
        (f"{n}{u}" if u != "junk" else "不明", ts.replace(microsecond=0))
        for n, u, ts in cases
    ]
    df = spark_global.createDataFrame(rows, "published string, extracted timestamp")
    got = [
        r.d
        for r in df.select(
            convert_relative_date(F.col("published"), F.col("extracted")).alias("d")
        ).collect()
    ]
    want = [
        _model(n, u, ts.replace(microsecond=0)) if u != "junk" else None
        for n, u, ts in cases
    ]
    assert got == want
