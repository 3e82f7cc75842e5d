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


def seen_keys_dedup(events: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """First-occurrence pass-through on the transformWithState API (the
    arbitrary-state successor to applyInPandasWithState): emit each
    (user_id, event_id) exactly once across micro-batches; re-deliveries
    are swallowed by a per-user ValueState set of seen event ids.

    Unlike ``streaming_dedup`` (dropDuplicatesWithinWatermark), the seen
    set here survives past any watermark — exactly-once forever, with the
    state-size trade made explicit via ``ttl_ms`` (state TTL evicts idle
    users; None keeps them indefinitely). State partitions by user hash
    like any groupBy, so scale-out and skew behave like the rest of the
    engine.

    Runtime dependency: transformWithState's Python state server speaks
    protobuf — environments without ``google.protobuf`` (this container)
    fail at stream start with an ImportError from Spark's driver worker;
    the covering test importorskips on exactly that.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    ttl = ttl_ms  # captured by the processor below

    class SeenKeys(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType([StructField("ids", ArrayType(LongType()))])
            self._seen = handle.getValueState("seen", schema, ttlDurationMs=ttl)

        def handleInputRows(self, key, rows, timerValues):
            seen = set(self._seen.get()[0]) if self._seen.exists() else set()
            out = []
            for pdf in rows:
                for eid in pdf["event_id"]:
                    e = int(eid)
                    if e not in seen:
                        seen.add(e)
                        out.append(e)
            self._seen.update(([*map(int, sorted(seen))],))
            yield pd.DataFrame({"user_id": [key[0]] * len(out), "event_id": out})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        SeenKeys(),
        outputStructType="user_id long, event_id long",
        outputMode="append",
        timeMode="none",
    )
