"""Scalar-function modules (pure column expressions; zero Python UDFs for the
reference's core surface — see SURVEY.md §2.12)."""

from tibame_project_spark.functions.dates import (  # noqa: F401
    convert_relative_date,
    normalize_fb_date,
    quarter_case,
)
from tibame_project_spark.functions.keys import md5_id, surrogate_key  # noqa: F401
from tibame_project_spark.functions.text import (  # noqa: F401
    extract_city,
    extract_region,
    parse_paren_year,
    parse_rating,
    split_delimited,
)
