"""Stateful streaming: dedup-within-watermark and
applyInPandasWithState running totals, driven through real
micro-batches."""

import datetime as dt
import os
import tempfile

from aws_etl_pipeline_spark.streaming.stateful import (
    dedup_stream,
    running_totals_stream,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_batch(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)


def test_streaming_dedup_drops_redelivery(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    with tempfile.TemporaryDirectory() as d:
        _write_batch(
            spark,
            d,
            [
                (1, base, 10, "click", 1.0, "{}"),
                (2, base + dt.timedelta(minutes=1), 10, "click", 2.0, "{}"),
            ],
        )
        stream = spark.readStream.schema(SCHEMA).parquet(d)
        q = (
            dedup_stream(stream)
            .writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        # batch 2 redelivers event 1 (same id) plus a new event
        _write_batch(
            spark,
            d,
            [
                (1, base, 10, "click", 1.0, "{}"),  # duplicate -> dropped
                (3, base + dt.timedelta(minutes=2), 10, "view", 3.0, "{}"),
            ],
        )
        q.processAllAvailable()
        q.stop()
        ids = sorted(r.event_id for r in spark.table("t_dedup").collect())
    assert ids == [1, 2, 3]


def test_apply_in_pandas_with_state_running_totals(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    with tempfile.TemporaryDirectory() as d:
        _write_batch(
            spark,
            d,
            [
                (1, base, 7, "click", 10.0, "{}"),
                (2, base, 7, "click", 5.0, "{}"),
                (3, base, 8, "view", 2.0, "{}"),
            ],
        )
        stream = spark.readStream.schema(SCHEMA).parquet(d)
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("t_state")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        _write_batch(spark, d, [(4, base, 7, "click", 1.0, "{}")])
        q.processAllAvailable()
        q.stop()
        rows = spark.table("t_state").collect()
    # last emission per user reflects state carried across batches
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[7] == (3, 16.0)  # 10+5 in batch1, +1 in batch2
    assert latest[8] == (1, 2.0)
