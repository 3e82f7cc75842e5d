"""The LLM training-data release pipeline — every corpus operator composed
as ONE lazy DataFrame DAG.

This is the composition target the individual operators exist for: a user
releasing a training corpus runs quality gating, PII scrubbing, corpus-wide
line dedup, exact dedup, benchmark decontamination and chunking as a single
plan. Catalyst sees the whole lineage (filters push through, projections
prune, the six stages share one scan), and the pipeline stays deterministic
end-to-end, so the ENTIRE composition is verifiable against a SQL oracle —
not just each stage in isolation.

Stage order is the standard one (quality → scrub → line-dedup → exact-dedup
→ decontaminate → chunk): cheap narrow filters first to shrink the corpus
before the shuffling stages, redaction before any hashing so hashes reflect
released text, dedup before decontamination so overlap checks run once per
surviving text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def release_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "bench_text",
    chunk_tokens: int = 64,
    decontaminate_n: int = 5,
    base_hash=None,
    materialize: bool = True,
) -> DataFrame:
    """documents × benchmark → released chunks with provenance.

    Returns (id, chunk_idx, chunk, n_tokens) for every surviving document.
    ``base_hash`` forwards to ``decontaminate`` (md5 for oracle parity).

    ``materialize`` persists the post-exact-dedup frame: decontamination
    consumes it on two branches (gram explode + anti-join), and without a
    barrier Catalyst re-executes the entire five-stage upstream lineage for
    each branch — 2× the quality battery, scrub, and both dedup shuffles.
    At 100 TB the same barrier is a parquet materialization between
    pipeline stages (checkpoint-restart for free); in-session, persist()
    is the equivalent move.
    """
    from tibame_project_spark.functions.pii import scrub_pii
    from tibame_project_spark.functions.textstats import chunk_text, gopher_metrics
    from tibame_project_spark.operators.dedup import (
        decontaminate,
        line_dedup_corpus,
        xxhash_base_hash,
    )
    from pyspark.sql import Window

    # 1. quality gate (narrow; the staged single-pass battery). The verdict
    # is persisted BEFORE filtering: filtering the projection directly lets
    # PushPredicateThroughNonJoin inline the whole staged HOF battery into
    # one per-row predicate — staging undone, every metric re-evaluated
    # inside every comparison (measured 7× slower). The barrier is (id,
    # passes) — bytes per row at any corpus size.
    gate = gopher_metrics(docs, text_col, [id_col]).select(id_col, "passes")
    if materialize:
        gate = gate.persist()
    passed_ids = gate.filter(F.col("passes")).select(id_col)
    passed = docs.join(passed_ids, id_col, "left_semi").select(id_col, text_col)

    # 2. PII scrub (narrow) — before hashing so dedup keys see released text
    scrubbed = passed.withColumn(text_col, scrub_pii(F.col(text_col)))

    # 3. corpus-wide line dedup; drop docs that became empty
    line_deduped = line_dedup_corpus(scrubbed, text_col, id_col).filter(
        F.length(text_col) > 0
    ).select(id_col, text_col)

    # 4. exact dedup: smallest id survives per distinct text
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    exact = (
        line_deduped.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if materialize:
        exact = exact.persist()

    # 5. benchmark decontamination (hashed n-gram overlap, broadcast bench)
    clean = decontaminate(
        exact,
        benchmark,
        text_col,
        id_col,
        bench_text_col,
        n=decontaminate_n,
        base_hash=base_hash or xxhash_base_hash,
    )

    # 6. chunk to the training context size
    return chunk_text(clean, text_col, id_col, max_tokens=chunk_tokens)
