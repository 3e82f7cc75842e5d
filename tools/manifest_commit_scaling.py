"""Manifest metadata write cost vs live-file count (r09 verdict item 6).

Every manifest commit rewrites the FULL per-version manifest — one row
per live file, carry-forward rows included. At 100k files (a 100 TB
table at 1 GB files) that is a 100k-row parquet per commit. This tool
measures whether that O(files) rewrite actually shows up in commit
latency, to decide if the manifest needs an Iceberg-style split into
carried/changed segments behind the same read API.

Method: create a real (small) manifest table, then FORGE a head version
whose manifest carries N synthetic carry-forward rows (fake paths with
key ranges far outside any test batch, so no operation ever selects
them as candidates and no data file is ever opened — exactly the
carry-forward role they play in a real big table). Then time:

- ``append_manifest_table`` of a tiny batch (pure metadata union), and
- ``merge_manifest_table`` of a tiny batch hitting only the real files
  (bounds-prune drops every synthetic row before the semi-join),

at N in {1k, 10k, 50k, 100k}. Each timing is best-of-3 (this host shows
CPU-steal bursts; the minimum measures the code path).

Usage:
    python tools/manifest_commit_scaling.py [--out -]

Prints a JSON line per N; paste the table into SCALE.md. Run out of
band — this is a measurement tool, not part of bench.py's record.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def forge_carry_rows(spark, base, n_rows, version):
    """Append n_rows synthetic carry-forward entries to version's
    manifest in place (fake paths, key range [10^9, 2*10^9) — outside
    every batch this tool issues), rewriting the manifest parquet the
    same way a commit would."""
    man = spark.read.parquet(f"{base}/manifest/v={version}")
    fake = spark.range(n_rows).select(
        F.concat(F.lit("data/c=forged/part-"), F.col("id")).alias("path"),
        F.lit(128 * 1024 * 1024).cast("long").alias("bytes"),
        F.lit(100000).cast("long").alias("rows"),
        (F.lit(1000000000) + F.col("id") * 1000).alias("min_id"),
        (F.lit(1000000000) + F.col("id") * 1000 + 999).alias("max_id"),
        F.lit(None).cast("string").alias("dv_path"),
        F.lit(0).alias("schema_id"),
    )
    man.unionByName(fake).coalesce(1).write.mode("overwrite").parquet(
        f"{base}/manifest/v={version}__forged"
    )
    shutil.rmtree(f"{base}/manifest/v={version}")
    shutil.move(f"{base}/manifest/v={version}__forged", f"{base}/manifest/v={version}")


def measure(spark, n_carry):
    from tibame_project_spark.sources.manifest import (
        append_manifest_table,
        merge_manifest_table,
        read_manifest_version,
        write_manifest_table,
    )

    base = tempfile.mkdtemp(prefix=f"manscale_{n_carry}_")
    shutil.rmtree(base)
    rows = spark.range(1000).select(F.col("id"), F.col("id").alias("v"))
    write_manifest_table(
        spark, rows, base, stats_cols=["id"], cluster_by="id", n_files=4,
        keep=3,
    )
    forge_carry_rows(spark, base, n_carry, read_manifest_version(spark, base))
    out = {"carry_rows": n_carry}
    for op in ("append", "merge"):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            if op == "append":
                append_manifest_table(
                    spark,
                    spark.range(10).select(
                        (F.col("id") + 5000).alias("id"),
                        F.col("id").alias("v"),
                    ),
                    base, keep=3,
                )
            else:
                merge_manifest_table(
                    spark,
                    spark.range(10).select(
                        F.col("id"), (F.col("id") + 7).alias("v")
                    ),
                    base, "id", keep=3,
                )
            best = min(best, time.monotonic() - t0)
        out[f"{op}_s"] = round(best, 3)
    # manifest read path at this file count (prune + collect of paths)
    from tibame_project_spark.sources.manifest import manifest_file_paths

    t0 = time.monotonic()
    paths = manifest_file_paths(spark, base, prune="max_id < 1000000000")
    out["prune_collect_s"] = round(time.monotonic() - t0, 3)
    out["pruned_to"] = len(paths)
    shutil.rmtree(base, ignore_errors=True)
    return out


def main():
    argparse.ArgumentParser(description=__doc__).parse_args()
    from tibame_project_spark.session import get_spark

    spark = get_spark("manifest_commit_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (1000, 10000, 50000, 100000):
        print(json.dumps(measure(spark, n)))


if __name__ == "__main__":
    main()
