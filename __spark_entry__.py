"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises one (or a cluster of) SURVEY.md §2
operators through the engine package, on the driver's synthetic TPC-H-ish
tables; each ``oracle_sql()`` entry is the ANSI-SQL twin DuckDB runs on the
same parquet. Columns are aliased identically on both sides (the driver's
compare sorts columns by name and hashes values).

Determinism policy (so value-hashes match bit-for-bit):

* double SUM/AVG go through DECIMAL(18,x) partial sums — exact and
  order-independent — then cast back to double;
* window top-k / keep-last always carry a unique trailing tie-break column;
* calendar math runs on naive timestamps in UTC on both engines;
* regexp '' vs NULL mismatches are normalized with NULLIF.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tibame_project_spark.catalog import load
from tibame_project_spark.functions.dates import convert_relative_date, quarter_case
from tibame_project_spark.functions.keys import md5_id
from tibame_project_spark.functions.textstats import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from tibame_project_spark.operators.corrections import apply_deletes, apply_updates
from tibame_project_spark.operators.dedup import (
    dedup_exact_text,
    dedup_keep_last,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from tibame_project_spark.operators.joins import anti_join, fuzzy_top1_join, star_join
from tibame_project_spark.operators.reshape import melt
from tibame_project_spark.partitioning import ensure_parallelism
from tibame_project_spark.operators.similarity import cosine_topk, embedding_dedup_pairs
from tibame_project_spark.streaming.incremental import windowed_event_counts

SF_SMOKE = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# deterministic-aggregation helpers (Spark side + SQL-text twin)
# ---------------------------------------------------------------------------

def _dsum(col, scale: int = 2):
    """Order-independent double sum: exact decimal partials, double out."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _DSUM(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_mart_star_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the mart_review_trends shape (J5 star join + 11-key groupBy
    + COUNT + ROUND(AVG,2), d_gmaps_mart_review_trends.py:71-106) on the
    orders star. region/nation are broadcast; orders only shuffles for the
    final aggregation."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = star_join(
        orders,
        [
            (customer, orders["o_custkey"] == customer["c_custkey"]),
            (nation, customer["c_nationkey"] == nation["n_nationkey"]),
            (region, nation["n_regionkey"] == region["r_regionkey"]),
        ],
        broadcast_dims=True,
    )
    od = F.to_date(orders["o_orderdate"])
    return joined.groupBy(
        region["r_name"].alias("region_name"),
        nation["n_name"].alias("nation_name"),
        F.year(od).alias("order_year"),
        F.month(od).alias("order_month"),
        quarter_case(F.month(od)).alias("order_quarter"),
        orders["o_orderpriority"].alias("priority"),
    ).agg(
        F.count(orders["o_orderkey"]).alias("total_orders"),
        # avg = exact decimal sum ÷ count: one IEEE division, no rounding —
        # bit-identical on any engine regardless of aggregation order.
        (_dsum(orders["o_totalprice"]) / F.count(orders["o_orderkey"])).alias("avg_price"),
    )


_MART_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CASE WHEN month(o_orderdate) IN (1,2,3) THEN 1
            WHEN month(o_orderdate) IN (4,5,6) THEN 2
            WHEN month(o_orderdate) IN (7,8,9) THEN 3
            ELSE 4 END AS order_quarter,
       o_orderpriority AS priority,
       COUNT(o_orderkey) AS total_orders,
       {dsum} / COUNT(o_orderkey) AS avg_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1,2,3,4,5,6
""".format(dsum=_DSUM("o_totalprice"))


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (A1 aggregation surface) on lineitem."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price, 4).alias("sum_disc_price"),
        (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_DSUM("l_quantity")} AS sum_qty,
       {_DSUM("l_extendedprice")} AS sum_base_price,
       {_DSUM("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       {_DSUM("l_quantity")} / COUNT(*) AS avg_qty,
       {_DSUM("l_extendedprice")} / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_time build (F4/F5 + D1, d_gmaps_dim_time.py:35-50) over order dates."""
    from tibame_project_spark.plans.gmaps import dim_time

    orders = load(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("published_at"))
    return dim_time(orders)


_DIM_TIME_SQL = """
SELECT DISTINCT CAST(o_orderdate AS DATE) AS date,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       CAST(month(o_orderdate) AS INTEGER) AS month,
       CAST(day(o_orderdate) AS INTEGER) AS day,
       CASE WHEN month(o_orderdate) IN (1,2,3) THEN 1
            WHEN month(o_orderdate) IN (4,5,6) THEN 2
            WHEN month(o_orderdate) IN (7,8,9) THEN 3
            ELSE 4 END AS quarter
FROM orders
"""


def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 keep-last dedup (fb_scraper keep latest scrape per post_link) on
    events: latest event per (user_id, event_type)."""
    ev = load(spark, sf_dir, "events")
    out = dedup_keep_last(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")])
    return out.select("user_id", "event_type", "event_id", "value")


_KEEP_LAST_SQL = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t WHERE rn = 1
"""


def q_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via md5-groupBy (training-data tier) on documents."""
    docs = load(spark, sf_dir, "documents")
    return dedup_exact_text(docs, "text", "doc_id")


_EXACT_TEXT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/M3 anti-join (NOT IN subquery, create_dim_attraction_hashtag.py:187-190)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return anti_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_md5_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 md5 surrogate keys (airflow/utils/common.py:8-19) on part names."""
    part = load(spark, sf_dir, "part")
    return part.select("p_partkey", md5_id(F.col("p_name")).alias("part_uid"))


_MD5_SQL = "SELECT p_partkey, md5(p_name) AS part_uid FROM part"


def q_relative_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 zh relative-date resolution (convertDate,
    d_gmaps_reviews_src_to_ods.py:51-62): synthesize "N<unit>前" strings from
    event attributes, resolve against the event timestamp."""
    ev = load(spark, sf_dir, "events")
    n = (F.floor(F.abs(F.col("value"))).cast("long") % 10 + 1)
    unit = (
        F.when(F.col("event_type") == "click", "分鐘前")
        .when(F.col("event_type") == "view", "小時前")
        .when(F.col("event_type") == "purchase", "天前")
        .when(F.col("event_type") == "signup", "週前")
        .when(F.col("event_type") == "error", "個月前")
        .otherwise("年前")
    )
    pub = F.concat(n.cast("string"), unit)
    return ev.select(
        "event_id",
        convert_relative_date(pub, F.col("ts")).alias("published_date"),
    )


_RELDATE_SQL = """
WITH e AS (
  SELECT event_id, ts,
         (CAST(floor(abs(value)) AS BIGINT) % 10) + 1 AS n,
         event_type FROM events)
SELECT event_id,
  CASE event_type
    WHEN 'click'    THEN CAST(ts - to_minutes(n) AS DATE)
    WHEN 'view'     THEN CAST(ts - to_hours(n) AS DATE)
    WHEN 'purchase' THEN CAST(ts - to_days(CAST(n AS INTEGER)) AS DATE)
    WHEN 'signup'   THEN CAST(ts - to_days(CAST(7*n AS INTEGER)) AS DATE)
    WHEN 'error'    THEN CAST(CAST(ts AS DATE) - to_months(CAST(n AS INTEGER)) AS DATE)
    ELSE                 CAST(CAST(ts AS DATE) - to_years(CAST(n AS INTEGER)) AS DATE)
  END AS published_date
FROM e
"""


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 fuzzy top-1 join (fuzzywuzzy extractOne, common.py:22-28):
    best-Levenshtein customer name per supplier name."""
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = fuzzy_top1_join(
        supplier.select("s_suppkey", "s_name"),
        customer,
        "s_name",
        "c_name",
        tie_break=["c_custkey"],
    )
    return out.select("s_suppkey", "c_custkey", "distance")


_FUZZY_SQL = """
SELECT s_suppkey, c_custkey, distance FROM (
  SELECT s_suppkey, c_custkey, levenshtein(s_name, c_name) AS distance,
         row_number() OVER (PARTITION BY s_suppkey, s_name
                            ORDER BY levenshtein(s_name, c_name), c_name, c_custkey) AS rn
  FROM supplier CROSS JOIN customer) t
WHERE rn = 1
"""


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k (§2.6 surface): top-3 events by value per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "event_id", "value", "rank")
    )


_TOPK_SQL = """
SELECT user_id, event_id, value, CAST(rank AS INTEGER) AS rank FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
  FROM events) t WHERE rank <= 3
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 melt/unpivot (taipei wide→long matrix) on lineitem measures."""
    li = load(spark, sf_dir, "lineitem")
    return melt(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 explode + token counting (text-analysis tier) on documents."""
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_TOKEN_COUNTS_SQL = r"""
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token
  FROM documents) t
GROUP BY token
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality/statistics scalars (training-data tier): token count,
    punctuation, stopword ratio, quality score, bag-of-words fingerprint."""
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        stopword_ratio(t).alias("stop_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


_DOC_STATS_SQL = r"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], lower(x)))) AS n_stop
  FROM d)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_punct AS INTEGER) AS n_punct,
       CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
       ((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN (CASE WHEN length(text) > 0 THEN CAST(n_punct AS DOUBLE)/length(text) ELSE 0.0 END) < 0.1 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN n_stop > 0 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality,
       md5(array_to_string(list_sort(list_transform(toks, x -> lower(x))), ' ')) AS fp
FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword markers + CJK override)."""
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def _lang_sql() -> str:
    hits = {
        lang: f"len(list_filter(toks, x -> list_contains({list(words)!r}, lower(x))))"
        for lang, words in LANG_MARKERS.items()
    }
    return rf"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
h AS (
  SELECT doc_id, text,
         {hits['en']} AS h_en, {hits['es']} AS h_es,
         {hits['de']} AS h_de, {hits['fr']} AS h_fr
  FROM d)
SELECT doc_id,
  CASE
    WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
    WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
    WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
    WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
    WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
    ELSE 'fr'
  END AS lang_pred
FROM h
"""


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-day rollup (streaming tier's windowed agg, batch-run): the
    day-partitioned daily aggregate of the reference, via the shared
    streaming/batch code path."""
    ev = load(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    return out.select(
        F.to_date("window_start").alias("day"),
        "event_type",
        "n",
        "total_value",
    )


_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS n,
       {dsum} AS total_value
FROM events GROUP BY 1, 2
""".format(dsum=_DSUM("value"))


def q_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 UPDATE+DELETE as corrections-data (create_dim_attraction_hashtag
    :134-186, create_dim_attraction_detail:123-199) applied to nation."""
    nation = load(spark, sf_dir, "nation")
    updates = spark.createDataFrame(
        [(1, "CORRECTED_A"), (2, "CORRECTED_B")], ["n_nationkey", "n_name"]
    )
    deletes = spark.createDataFrame([(3,), (4,)], ["n_nationkey"])
    out = apply_updates(nation, updates, "n_nationkey")
    out = apply_deletes(out, deletes, "n_nationkey")
    return out.select("n_nationkey", "n_name", "n_regionkey")


_CORRECTIONS_SQL = """
SELECT n_nationkey,
       CASE n_nationkey WHEN 1 THEN 'CORRECTED_A' WHEN 2 THEN 'CORRECTED_B'
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation WHERE n_nationkey NOT IN (3, 4)
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 UNION DISTINCT (create_dim_attraction_hashtag.py:88-94): customers
    active in H1 union customers with big orders."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.month("o_orderdate") <= 6).select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.union(b).distinct()


_UNION_SQL = """
SELECT o_custkey FROM orders WHERE month(o_orderdate) <= 6
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props payload (semi-structured
    scan surface)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )


_JSON_SQL = """
SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine top-5 neighbors for the first
    10 vectors against the rest (ANN correctness baseline)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    items = emb.filter(F.col("vec_id") >= 10)
    return cosine_topk(items, queries, k=5)


_COSINE_SQL = """
SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank, score FROM (
  SELECT q.vec_id AS query_id, i.vec_id AS vec_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(CAST(i.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC,
                                     i.vec_id) AS rank,
         ROUND(list_cosine_similarity(CAST(i.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS score
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10) i
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q) t
WHERE rank <= 5
"""


# -- rows-only checks (no SQL-expressible oracle; driver records row count) --

def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs over documents (scale-path dedup;
    banded LSH + exact-Jaccard verify)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit signature, top-16-bit blocking)."""
    docs = load(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, "text", "doc_id", max_distance=8)


_EMBED_PLANES = [
    [((i * 7 + j * 13) % 19 - 9) / 9.0 for j in range(64)] for i in range(12)
]


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via sign-LSH bucketing + exact cosine
    verify (threshold 0.9)."""
    emb = load(spark, sf_dir, "embeddings")
    return embedding_dedup_pairs(emb, threshold=0.9, planes=_EMBED_PLANES)


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check)."""
    return q_mart_star_trends(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mart_star_trends": q_mart_star_trends,
        "pricing_summary": q_pricing_summary,
        "dim_time": q_dim_time,
        "dedup_keep_last": q_dedup_keep_last,
        "dedup_exact_text": q_dedup_exact_text,
        "customers_without_orders": q_customers_without_orders,
        "md5_surrogate": q_md5_surrogate,
        "relative_date": q_relative_date,
        "fuzzy_match": q_fuzzy_match,
        "window_topk": q_window_topk,
        "unpivot_measures": q_unpivot,
        "token_counts": q_token_counts,
        "doc_stats": q_doc_stats,
        "lang_id": q_lang_id,
        "events_rollup": q_events_rollup,
        "corrections": q_corrections,
        "union_distinct": q_union_distinct,
        "json_extract": q_json_extract,
        "cosine_topk": q_cosine_topk,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_dups": q_embedding_dups,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mart_star_trends": _MART_SQL,
        "pricing_summary": _PRICING_SQL,
        "dim_time": _DIM_TIME_SQL,
        "dedup_keep_last": _KEEP_LAST_SQL,
        "dedup_exact_text": _EXACT_TEXT_SQL,
        "customers_without_orders": _ANTI_SQL,
        "md5_surrogate": _MD5_SQL,
        "relative_date": _RELDATE_SQL,
        "fuzzy_match": _FUZZY_SQL,
        "window_topk": _TOPK_SQL,
        "unpivot_measures": _UNPIVOT_SQL,
        "token_counts": _TOKEN_COUNTS_SQL,
        "doc_stats": _DOC_STATS_SQL,
        "lang_id": _lang_sql(),
        "events_rollup": _ROLLUP_SQL,
        "corrections": _CORRECTIONS_SQL,
        "union_distinct": _UNION_SQL,
        "json_extract": _JSON_SQL,
        "cosine_topk": _COSINE_SQL,
        # minhash_pairs / simhash_pairs / embedding_dups: LSH banding +
        # sketching are not reasonably SQL-expressible → rows-only check.
    }
