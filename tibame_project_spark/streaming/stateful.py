"""Custom stateful streaming operator: applyInPandasWithState.

The declarative tier (session_window / tumbling windows, incremental.py)
covers the reference's needs; this module is the escape hatch for state
machines Spark's built-ins can't express — running per-key totals that
survive across micro-batches (and restarts, via the checkpoint) is the
canonical shape: per-user lifetime counters, dedup-seen sets, feature
freshness tracking.

Scale notes: state lives in the executor state store partitioned by key —
the same hash partitioning as any groupBy, so hot keys are the same skew
problem (salt upstream if one key dominates). Arrow batches bound the
Python transfer exactly as in mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value), emitted each micro-batch a
    user appears in; state carries across batches via the checkpoint."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
