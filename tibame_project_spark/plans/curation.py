"""Incremental corpus curation: dedup/decontamination as tombstone-CDC
on a manifest-backed documents table.

``plans.release.release_corpus`` is the BATCH shape — read everything,
filter everything, write everything. This module is the shape a corpus
that's already landed takes at 100 TB: documents live in a
``sources.manifest`` table keyed by document id, a curation pass derives
a TOMBSTONE batch (exact-dedup losers, benchmark-contaminated docs), and
``merge_manifest_table`` applies it — rewriting only the files that hold
a condemned document and carrying every clean file forward verbatim in
the manifest. Curation cost tracks the condemned set, not the corpus.

The analysis side is still a scan (global dedup must see every hash
once — that's inherent); the storage side is where the format earns its
keep: at a 1% condemnation rate, ~99% of a clustered corpus's files are
untouched metadata carry-forwards instead of rewrites. Repeated passes
are fixpoints — a doc already tombstoned is gone, so the next pass
derives an empty batch for it.

Reference parity: the reference's pipelines rebuild their dims from
scratch per run (create_dim_attraction_*.py) because BigQuery's storage
absorbs the rewrite; this is the same logical "drop the bad rows"
expressed as an incremental commit instead of a rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_dedup_tombstones(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The LOSERS of exact text dedup — every row whose text's md5 is
    shared with a smaller-id row — as a full-row tombstone batch
    (``dead=true``) ready for ``merge_manifest_table``. The winner
    (smallest id per distinct text) is untouched, mirroring
    ``operators.dedup.dedup_exact_text``'s keep-best rule; the shuffle
    key is the 16-byte digest, never the text."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .drop("__rn")
        .withColumn("dead", F.lit(True))
    )


def contamination_tombstones(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "bench_text",
    n: int = 5,
    base_hash=None,
) -> DataFrame:
    """Docs sharing an n-gram with the benchmark, as a tombstone batch —
    the complement of ``operators.dedup.decontaminate`` (which returns
    the clean set), derived with one extra left-anti join on the id.
    ``base_hash`` overrides the gram hash family (production default
    xxhash64; the oracle-gated query passes md5 for DuckDB parity)."""
    from tibame_project_spark.operators.dedup import decontaminate

    kw = {"base_hash": base_hash} if base_hash is not None else {}
    clean_ids = decontaminate(
        docs, benchmark, text_col, id_col, bench_text_col, n=n, **kw
    ).select(id_col)
    return docs.join(clean_ids, id_col, "left_anti").withColumn(
        "dead", F.lit(True)
    )


def curate_corpus(
    spark: SparkSession,
    base_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    bench_text_col: str = "bench_text",
    decontaminate_n: int = 5,
    base_hash=None,
    use_deletion_vectors: bool = False,
    stage: bool = False,
    keep: int = 2,
) -> tuple[int | str | None, int]:
    """One curation pass over a manifest-backed corpus: derive the
    tombstone batch (exact-dedup losers, plus benchmark contamination
    when ``benchmark`` is given) and apply it. Returns
    ``(version, n_tombstones)`` — ``version`` is None when the corpus
    was already clean (no commit; a no-op pass leaves no version noise).

    ``stage=True`` runs the pass as WRITE-AUDIT-PUBLISH instead of
    committing: the tombstone apply (merge rewrite, or deletion-vector
    sidecar when ``use_deletion_vectors=True``) is fully prepared but
    unpublished, and the return is ``(stage_token, n_tombstones)``.
    Audit the would-be corpus with
    ``sources.manifest.read_staged_manifest`` (survivor counts, quality
    metrics, a held-out contamination probe), then
    ``publish_staged_manifest`` — concurrent disjoint commits during the
    audit are rebased over — or ``abandon_staged_manifest``. The shape
    for curation passes that need sign-off before rewriting a
    production corpus.

    ``use_deletion_vectors=False`` (default) applies tombstones via
    ``merge_manifest_table`` — files holding a condemned doc are
    REWRITTEN (physical reclaim now). ``True`` applies them via
    ``delete_manifest_table`` — ZERO data files rewritten, condemned ids
    land in per-file sidecars and physical reclaim is deferred to the
    next compaction; at curation's typical touch pattern (a few rows
    condemned in MOST files) this turns a near-full-corpus rewrite into
    a metadata-plus-sidecar commit, which is the shape that survives
    100 TB. Repeated passes stay fixpoints either way (a condemned doc
    is invisible to the next pass's read).

    The batch is materialized (it is condemned-set-sized, not
    corpus-sized) before the apply so deriving it doesn't re-run inside
    the candidate-file join."""
    from tibame_project_spark.sources.manifest import (
        delete_manifest_table,
        merge_manifest_table,
        read_manifest_table,
        stage_delete_manifest_table,
        stage_merge_manifest_table,
    )

    docs = read_manifest_table(spark, base_path)
    tombs = exact_dedup_tombstones(docs, id_col=id_col, text_col=text_col)
    if benchmark is not None:
        survivors = docs.join(
            tombs.select(id_col), id_col, "left_anti"
        )
        tombs = tombs.unionByName(
            contamination_tombstones(
                survivors,
                benchmark,
                id_col=id_col,
                text_col=text_col,
                bench_text_col=bench_text_col,
                n=decontaminate_n,
                base_hash=base_hash,
            )
        )
    tombs = tombs.localCheckpoint(eager=True)
    n_tombs = tombs.count()
    if n_tombs == 0:
        return None, 0
    if stage:
        token = (
            stage_delete_manifest_table(
                spark, tombs.select(id_col), base_path, id_col
            )
            if use_deletion_vectors
            else stage_merge_manifest_table(
                spark, tombs, base_path, id_col, delete_col="dead"
            )
        )
        return token, n_tombs
    if use_deletion_vectors:
        version = delete_manifest_table(
            spark, tombs.select(id_col), base_path, id_col, keep=keep
        )
    else:
        version = merge_manifest_table(
            spark, tombs, base_path, id_col, delete_col="dead", keep=keep
        )
    return version, n_tombs
