"""Data-quality expectations: declarative constraints validated in ONE scan.

The reference enforces quality by hand — BQ SQL patches for known-bad rows
(``airflow/dags/gmaps/d_gmaps_correct_data.py``) and schema declarations at
ingest. This module is the general form (the public pattern is AWS Deequ /
Great Expectations): declare constraints, get back a violations report, gate
the load on it. At 100 TB the design constraint is that N rules must cost
ONE pass over the table — every row-wise rule compiles to a conditional
count inside a single aggregate, so adding a rule adds a column to the agg,
never a job.

``unique()`` rules additionally need distinct counting; they ride the same
scan but each distinct column makes Catalyst plan an Expand (standard
multi-distinct rewrite) — fine for a handful, and the report docstring says
so instead of letting the cost surprise anyone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a rule is (rule_name, column_label, kind, payload):
#   kind "row":    payload = violation predicate (Column, true == violation)
#   kind "unique": payload = column name


def not_null(col: str) -> tuple:
    return (f"not_null({col})", col, "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple:
    """Violation when outside [lo, hi]; NULLs do not violate (compose with
    not_null to forbid them — one rule, one meaning)."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        col,
        "row",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def matches(col: str, pattern: str) -> tuple:
    c = F.col(col)
    return (
        f"matches({col})",
        col,
        "row",
        c.isNotNull() & ~c.rlike(pattern),
    )


def in_set(col: str, values: list) -> tuple:
    c = F.col(col)
    return (
        f"in_set({col})",
        col,
        "row",
        c.isNotNull() & ~c.isin(values),
    )


def custom(name: str, col: str, violation: Column) -> tuple:
    """Escape hatch: any boolean Column, true == violation."""
    return (name, col, "row", violation)


def unique(col: str) -> tuple:
    """Violations = surplus copies: count(col NOT NULL) − count(DISTINCT
    col). NULLs are not identities and never collide here."""
    return (f"unique({col})", col, "unique", col)


def validate_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate every rule in one aggregate over one scan of ``df``;
    returns the report relation ``(rule, column, n_violations, n_rows,
    passed)`` — |rules| rows, built driver-side from the single summary
    row (a report is a summary; it never needs a cluster).

    Gate pattern: ``assert validate_expectations(df, rules).filter(
    "NOT passed").isEmpty()`` before the write, or join the report into
    an audit table — either way the cost was one scan, so the gate can
    run on every ingest batch, not just when someone is suspicious.
    """
    summary = df.agg(*_rule_aggs(rules)).collect()[0]
    return _build_report(df.sparkSession, rules, dict(summary.asDict()))


def _rule_aggs(rules: list[tuple], *, allow_distinct: bool = True) -> list[Column]:
    if not rules:
        raise ValueError("expectations need at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, col, kind, payload) in enumerate(rules):
        if kind == "row":
            # sum over ZERO rows is NULL — an empty batch must read as zero
            # violations, not crash the gate
            aggs.append(
                F.coalesce(F.sum(F.when(payload, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias(f"__v{i}")
            )
        elif kind == "unique":
            if not allow_distinct:
                raise ValueError(
                    f"rule {name!r}: unique() needs a distinct aggregate, which "
                    "observed metrics do not support — check it with "
                    "validate_expectations (its own scan) instead"
                )
            aggs.append(
                (F.count(F.col(payload)) - F.count_distinct(F.col(payload)))
                .cast("long")
                .alias(f"__v{i}")
            )
        else:
            raise ValueError(f"unknown rule kind {kind!r} in rule {name!r}")
    return aggs


def _build_report(spark, rules: list[tuple], summary: dict) -> DataFrame:
    n = summary["__n"]
    report = [
        (name, col, int(summary[f"__v{i}"]), int(n), summary[f"__v{i}"] == 0)
        for i, (name, col, _, _) in enumerate(rules)
    ]
    from tibame_project_spark.localdf import local_rows_df

    return local_rows_df(
        spark, report,
        "rule string, column string, n_violations long, n_rows long, passed boolean",
    )


def observe_expectations(df: DataFrame, rules: list[tuple], *, name: str = "expectations"):
    """Attach the expectation metrics to ``df`` as OBSERVED metrics
    (``Dataset.observe``) so the gate rides whatever job consumes the
    frame — typically the ingest WRITE — for ZERO extra scans: the
    violation counters accumulate on the executors while the rows stream
    to parquet, instead of :func:`validate_expectations`'s own pass.

    Returns ``(observed_df, report_fn)``: run an action on
    ``observed_df`` (write it, count it), then call ``report_fn()`` for
    the same report relation ``validate_expectations`` builds. Calling
    ``report_fn()`` before any action blocks — Spark's Observation.get
    waits for the first action to finish.

    Only row-wise rules are supported here: observed metrics cannot
    contain distinct aggregates, so ``unique()`` rules raise upfront with
    a pointer to the scan-based gate. Batch frames only (streaming
    queries surface observations through the listener API instead).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *_rule_aggs(rules, allow_distinct=False))

    def report_fn() -> DataFrame:
        return _build_report(df.sparkSession, rules, dict(obs.get))

    return observed, report_fn
