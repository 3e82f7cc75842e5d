"""local_rows_df: the Arrow path for driver-local rows must be
behavior-identical to spark.createDataFrame(list, schema) — NULLs,
empties, dates, decimals — while skipping the Python-RDD stage whose
per-action worker round-trips cost seconds even for one row (measured:
a 1-row parquet write 4-6 s via the list path vs 0.15 s via Arrow on
local[32]). The manifest protocol's tiny frames (stage bounds, Bloom
probe values, history rows) all ride this."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql.types import (
    DateType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tibame_project_spark.localdf import local_rows_df


def test_matches_plain_path_with_nulls_and_mixed_types(spark):
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("d", DateType()),
        StructField("amt", DecimalType(18, 2)),
    ])
    rows = [
        (1, "a", datetime.date(2024, 1, 2), Decimal("10.50")),
        (2, None, None, None),
        (None, "c", datetime.date(1999, 12, 31), Decimal("0.01")),
    ]
    got = local_rows_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_empty_rows_give_empty_frame_with_schema(spark):
    got = local_rows_df(spark, [], "a long, b string")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["a", "b"]


def test_ddl_string_schema(spark):
    got = local_rows_df(spark, [(1, "x"), (2, None)], "a long, b string")
    assert {tuple(r) for r in got.collect()} == {(1, "x"), (2, None)}


def test_nested_types_fall_back_silently(spark):
    schema = StructType([
        StructField("id", LongType()),
        StructField(
            "kv",
            StructType([StructField("k", StringType()),
                        StructField("v", LongType())]),
        ),
    ])
    rows = [(1, ("a", 2)), (2, None)]
    got = local_rows_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


# -- property: equivalence with the plain path for arbitrary scalar rows --

from hypothesis import given, settings
from hypothesis import strategies as st

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=12),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(_cell, _cell), max_size=8))
def test_property_equivalent_to_plain_createDataFrame(spark_global, rows):
    """For arbitrary NULL-able scalar rows, the Arrow path and the plain
    path must produce identical (schema, multiset-of-rows) — local_rows_df
    underpins the manifest protocol's metadata frames, so 'mostly equal'
    is not enough."""
    from collections import Counter

    spark = spark_global
    # column types are fixed by the schema; draw per-column-typed rows
    typed = [
        (
            None if a is None else abs(hash(a)) % 1000,
            None if b is None else str(b)[:12],
        )
        for a, b in rows
    ]
    schema = "k long, s string"
    got = local_rows_df(spark, typed, schema)
    want = spark.createDataFrame(typed, schema)
    assert got.schema == want.schema
    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, want.collect())
    )
