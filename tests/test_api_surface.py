"""Coverage for the thin public-API rows that no driver query exercises —
each maps to a SURVEY §2 row or a documented engine extension, and an
untested export is one rename away from silent breakage."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_distinct_rows_and_dim_type(spark):
    """D1 full-row DISTINCT, and the dim_type plan built on it."""
    from tibame_project_spark.operators.dedup import distinct_rows
    from tibame_project_spark.plans.attractions import dim_type

    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["id", "v"])
    assert sorted(tuple(r) for r in distinct_rows(df).collect()) == [(1, "a"), (2, "b")]

    ta = spark.createDataFrame([("museum",), ("museum",), ("park",)], ["type"])
    ids = spark.createDataFrame([(10, "museum"), (20, "park"), (30, "zoo")], ["type_id", "type"])
    got = sorted(tuple(r) for r in dim_type(ta, ids).collect())
    assert got == [(10, "museum"), (20, "park")]


def test_explode_delimited_trims_elements(spark):
    """F11+F12: split on the reference's bullet delimiter, trim, explode."""
    from tibame_project_spark.operators.reshape import explode_delimited

    df = spark.createDataFrame([(1, "a • b •c")], ["id", "tags"])
    got = sorted(
        (r.id, r.tags) for r in explode_delimited(df, "tags", delim="•").collect()
    )
    assert got == [(1, "a"), (1, "b"), (1, "c")]


def test_header_transpose_builds_mapping(spark):
    """F14: the header row becomes a (column_name, value) mapping table."""
    from tibame_project_spark.operators.reshape import header_transpose

    df = spark.createDataFrame(
        [("header", "機關", "年度"), ("data", "x", "y")], ["kind", "c1", "c2"]
    )
    got = {
        r.column_name: r.value
        for r in header_transpose(
            df, F.col("kind") == "header", "column_name", ["c1", "c2"]
        ).collect()
    }
    assert got == {"c1": "機關", "c2": "年度"}


def test_lookup_join_broadcasts(spark):
    """J8: the lookup side must plan as a broadcast-hash join."""
    from tibame_project_spark.operators.joins import lookup_join

    df = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    dim = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = lookup_join(df, dim, "k")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    rows = {(r.k, r.name) for r in out.collect()}
    assert rows == {(1, "one"), (2, None)}


def test_save_table_lifecycle(spark):
    """S8/S9/S10: saveAsTable overwrite + the mode='ignore' create guard."""
    from tibame_project_spark.sources.writers import save_table

    df = spark.createDataFrame([(1,), (2,)], ["x"])
    save_table(df, "api_surface_t", mode="overwrite")
    assert spark.table("api_surface_t").count() == 2
    # ignore: existing table left untouched
    save_table(spark.createDataFrame([(99,)], ["x"]), "api_surface_t", mode="ignore")
    assert spark.table("api_surface_t").count() == 2
    spark.sql("DROP TABLE api_surface_t")


def test_pagerank_integer_symmetric_cycle(spark):
    """Exact integer PageRank: a directed cycle is rank-symmetric, total
    mass stays within N div-truncations of scale, and results are BIGINT
    (bit-identical under any partitioning — no float drift)."""
    from tibame_project_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    ranks = {r.node: r.rank for r in pagerank_integer(edges, "src", "dst").collect()}
    assert set(ranks) == {"a", "b", "c"}
    assert len(set(ranks.values())) == 1  # symmetry -> identical ranks
    scale = 10**12
    assert scale - 3 * 3 <= sum(ranks.values()) <= scale  # mass conservation


def test_serving_attraction_history_contract(spark):
    """init.sql attraction_history projection: names and int casts."""
    from tibame_project_spark.plans.serving import serving_attraction_history

    fact = spark.createDataFrame(
        [("A1", "2024", "7", "1500")], ["attraction_id", "year", "month", "number_people"]
    )
    out = serving_attraction_history(fact)
    assert out.columns == ["attraction_id", "year", "month", "number_people"]
    row = out.collect()[0]
    assert (row.year, row.month, row.number_people) == (2024, 7, 1500)
    assert dict(out.dtypes)["number_people"] == "int"


def test_ngram_jaccard_pairs_blocked_variant(spark):
    """The min-shingle-blocked probabilistic variant agrees with the exact
    one on pairs whose Jaccard clears the threshold AND share their global
    min shingle (identical docs trivially do)."""
    from tibame_project_spark.operators.dedup import (
        ngram_jaccard_exact_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    blocked = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_exact_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert blocked == exact == {(1, 2): 1.0}


def test_char_count_matches_length(spark):
    from tibame_project_spark.functions.textstats import char_count

    df = spark.createDataFrame([("héllo",), ("",)], ["t"])
    got = [r.n for r in df.select(char_count(F.col("t")).alias("n")).collect()]
    assert got == [5, 0]


def test_triangle_count_known_graphs(spark):
    from tibame_project_spark.operators.graph import triangle_count

    # K4 has C(4,3)=4 triangles; edges given unordered/duplicated/self-loop
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b] + [(2, 2)]
    df = spark.createDataFrame(k4, "src long, dst long")
    assert triangle_count(df, "src", "dst").first()["n_triangles"] == 4
    # a path graph has none
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(path, "src", "dst").first()["n_triangles"] == 0


def test_triangle_count_degree_order_same_count(spark):
    """Any total order generates each triangle exactly once from its least
    vertex — id order and degree order must agree on every graph."""
    import random

    from tibame_project_spark.operators.graph import triangle_count

    rng = random.Random(5)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long")
    by_id = triangle_count(df, "src", "dst", order_by="id").first()["n_triangles"]
    by_deg = triangle_count(df, "src", "dst", order_by="degree").first()["n_triangles"]
    assert by_id == by_deg and by_id > 0
    with __import__("pytest").raises(ValueError, match="order_by"):
        triangle_count(df, "src", "dst", order_by="random")


def test_triangle_degree_order_bounds_hub_wedges(spark):
    """On a star graph (one celebrity hub), id order can hand the hub an
    O(n²) wedge set; degree order orients every edge INTO the hub, so no
    node has out-degree > 1 and the wedge stage has nothing hot to do —
    the skew bound, asserted on the oriented out-degrees themselves."""
    from pyspark.sql import functions as F

    from tibame_project_spark.operators.graph import _oriented_edges

    # hub id 0 < all leaf ids: worst case for id order
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 51)], "src long, dst long"
    ).select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
    max_out_id = (
        _oriented_edges(star, "id").groupBy("u").count().agg(F.max("count")).first()[0]
    )
    max_out_deg = (
        _oriented_edges(star, "degree")
        .groupBy("u")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_out_id == 50  # hub owns every wedge pair: C(50,2) wedges
    assert max_out_deg == 1  # leaves (degree 1) point at the hub: 0 wedges


def test_shared_item_postings_memoizes_per_session_and_sf(spark):
    """sparse_topk and hybrid_rerank must reference the SAME postings build
    (that is the shared-inverted-index contract); switching corpora must
    rebuild, and the memo must not grow without bound."""
    import __spark_entry__ as entry

    a1 = entry._shared_item_postings(spark, "/root/testdata/sf0.001")
    a2 = entry._shared_item_postings(spark, "/root/testdata/sf0.001")
    assert a1 is a2
    b = entry._shared_item_postings(spark, "/root/testdata/sf0.01")
    assert b is not a1
    assert len(entry._POSTINGS_MEMO) == 1  # one corpus at a time


def _pagerank_model(edges, iterations=3, num=85, den=100, scale=10**12):
    """Pure-Python twin of pagerank_integer's redistribute recurrence."""
    srcs = {s for s, _ in edges}
    nodes = sorted(srcs | {d for _, d in edges})
    sinks = [n for n in nodes if n not in srcs]
    deg = {}
    for s, _ in set(edges):
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in sinks)
        csum = {v: 0 for v in nodes}
        for s, d in set(edges):
            csum[d] += r[s] // deg[s]
        r = {
            v: (scale * (den - num)) // (den * n)
            + (num * (csum[v] + dm // n)) // den
            for v in nodes
        }
    return r


def test_pagerank_integer_dangling_redistribute(spark):
    """r08 (VERDICT r07 #4): a graph WITH a sink — dangling mass is pooled
    and redistributed each round, bit-identical to the pure-Python integer
    model, and total mass is conserved within the truncation bound (the
    pre-r08 code silently dropped contributions into the sink)."""
    from tibame_project_spark.operators.graph import pagerank_integer

    # d is a pure sink: a->b->c->a cycle feeding d via b->d
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank_integer(df, "src", "dst").collect()}
    assert ranks == _pagerank_model(edges)
    scale = 10**12
    assert scale - 4 * 4 * 3 <= sum(ranks.values()) <= scale


def test_pagerank_integer_dangling_raise_and_fast_path(spark):
    """raise mode fails fast on a sink; on a sink-free graph redistribute
    and assume_none take the identical recurrence (bit-equal ranks)."""
    import pytest

    from tibame_project_spark.operators.graph import pagerank_integer

    sink = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="dangling"):
        pagerank_integer(sink, "src", "dst", dangling="raise")

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    via_probe = {r.node: r.rank
                 for r in pagerank_integer(cyc, "src", "dst").collect()}
    assumed = {r.node: r.rank
               for r in pagerank_integer(cyc, "src", "dst",
                                         dangling="assume_none").collect()}
    assert via_probe == assumed
