"""Custom stateful streaming operators (SURVEY §2B: stateful dedup,
applyInPandasWithState).

``dropDuplicates`` within a watermark covers the dedup the reference
would need if S3 redelivered events; ``running_totals_stream`` shows
the arbitrary-state path (applyInPandasWithState) for operators the
built-ins can't express — per-key state survives across micro-batches
and expires with the watermark.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id: duplicates arriving within
    the watermark horizon are dropped; state for expired event-times is
    garbage-collected. (Batch twin: stream_dedup_first.)"""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def _update_running(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running totals with explicit GroupState: the
    'custom stateful operator' escape hatch — state is a (count, sum)
    pair carried across micro-batches."""
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over a stream: emits the updated per-user
    running (count, total) each micro-batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Spark-4 native stateful operator (transformWithStateInPandas):
    the same per-user running totals as ``running_totals_stream`` but
    through the typed-state handle API — ValueState instead of a raw
    GroupState tuple. Requires the RocksDB state-store provider, which
    is also the right store at scale: state lives off-heap/on-disk with
    changelog checkpointing, so per-key state can exceed executor
    memory (the HDFS-backed default cannot)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any) -> Iterator[pd.DataFrame]:
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
