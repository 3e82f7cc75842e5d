"""Cross-source attraction dims/facts (the create_dim_* / create_fact_* DAGs).

These are the reference's BigQuery join queries re-expressed as DataFrame
ops; the manual UPDATE/DELETE patch batches become corrections-as-data
(operators.corrections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tibame_project_spark.functions.keys import md5_id
from tibame_project_spark.operators.corrections import apply_deletes, apply_updates, insert_missing
from tibame_project_spark.operators.joins import anti_join, left_join_chain


def fact_attraction_history(visitors: DataFrame, ids: DataFrame) -> DataFrame:
    """``create_fact_attraction_history.py:77-83``: monthly visitor counts ×
    generated attraction ids, USING(name), month NOT NULL."""
    return (
        visitors.join(ids, "name", "inner")
        .filter(F.col("month").isNotNull())
        .select("attraction_id", "name", "year", "month", "number_people")
    )


def dim_type(tripadvisor_types: DataFrame, type_ids: DataFrame) -> DataFrame:
    """``create_dim_type.py:77-81``: DISTINCT (type_id, type) via USING(type)."""
    return tripadvisor_types.join(type_ids, "type", "inner").select("type_id", "type").distinct()


def dim_attraction_type(hashtags: DataFrame, tripadvisor: DataFrame, types: DataFrame) -> DataFrame:
    """``create_dim_attraction_type.py:88-96``: two-step LEFT chain then
    type_id NOT NULL (effectively inner) — kept literal."""
    chained = left_join_chain(
        hashtags,
        [
            (tripadvisor, "name"),
            (types, tripadvisor["type"] == types["type_name"]),
        ],
    )
    return (
        chained.filter(F.col("type_id").isNotNull())
        .select("attraction_id", "name", "type_id")
        .distinct()
    )


def dim_attraction_hashtag(
    taipei_ids: DataFrame,
    trip_ids: DataFrame,
    *,
    updates: DataFrame | None = None,
    new_rows: DataFrame | None = None,
) -> DataFrame:
    """``create_dim_attraction_hashtag.py:88-94`` UNION DISTINCT of the two
    id-mapping sources, then the manual patch batches as data:
    13 UPDATEs (:134-186) → apply_updates, INSERT-NOT-IN (:187-190) →
    insert_missing."""
    dim = taipei_ids.select("attraction_id", "name").union(
        trip_ids.select("attraction_id", "name")
    ).distinct()
    if updates is not None:
        dim = apply_updates(dim, updates, "name")
    if new_rows is not None:
        dim = insert_missing(dim, new_rows, "name")
    return dim


def dim_attraction_detail(
    hashtags: DataFrame,
    tripadvisor: DataFrame,
    *,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """``create_dim_attraction_detail.py:79-84`` LEFT join to detail info;
    the 19 surgical null-row DELETEs (:123-199) as apply_deletes."""
    dim = hashtags.join(tripadvisor, "name", "left").select(
        "attraction_id", "name", "rating", "address"
    )
    if deletes is not None:
        dim = apply_deletes(dim, deletes, "attraction_id")
    return dim
