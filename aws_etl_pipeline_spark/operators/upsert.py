"""Upsert / MERGE sink (reference R17, `lambda_function.py:176-271`).

The reference upserts row-at-a-time into Redshift with
``INSERT ... ON CONFLICT (transaction_id) DO UPDATE SET amount,
processed_timestamp`` (`lambda_function.py:226-235`). The Spark-native
equivalent is a set-based MERGE: with Delta/Iceberg on the cluster
that's ``MERGE INTO`` (one shuffle, ACID); this environment has no
lakehouse jars, so ``merge_upsert`` implements the same semantics as a
pure DataFrame plan (full outer join on the key + coalesce), and
``merge_into_parquet`` wraps it as a read-merge-rewrite sink. Replay
of the same batch is idempotent — verified in tests/test_upsert.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_DELTA_AVAILABLE = False
try:  # pragma: no cover - not in this image
    from delta.tables import DeltaTable  # type: ignore # noqa: F401

    _DELTA_AVAILABLE = True
except ImportError:
    pass


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """MERGE semantics of R17: matched rows take ``update_cols`` from the
    source (all source columns by default), unmatched source rows are
    inserted, unmatched target rows are kept.

    One full-outer shuffle join on the key — the plan a MERGE INTO
    compiles to. The key must be unique per side (it is the PK,
    `lambda_function.py:199`).
    """
    cols = target.columns
    update_cols = update_cols or tuple(c for c in source.columns if c != key)
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    out_cols = []
    for c in cols:
        if c == key:
            out_cols.append(F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}")).alias(key))
        elif c in update_cols and c in source.columns:
            out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)


def merge_into_parquet(source: DataFrame, path: str, key: str) -> None:
    """Best-effort MERGE sink over a parquet directory: read existing
    target if present, merge, rewrite atomically-ish (tmp + rename at
    the FS layer is left to the deployment; local mode overwrites)."""
    spark = source.sparkSession
    if os.path.exists(path):
        target = spark.read.parquet(path)
        merged = merge_upsert(target, source, key)
    else:
        merged = source
    # Materialize before overwrite (source may read from `path`).
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


@query(
    "upsert_merge",
    oracle="""
WITH base AS (
  SELECT event_id, value, event_type FROM events WHERE event_id % 2 = 0
),
delta AS (
  SELECT event_id, value * 2 AS value, event_type FROM events WHERE event_id % 3 = 0
)
SELECT coalesce(t.event_id, s.event_id) AS event_id,
       coalesce(s.value, t.value)       AS value,
       coalesce(s.event_type, t.event_type) AS event_type
FROM base t FULL OUTER JOIN delta s ON t.event_id = s.event_id
""",
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17 upsert as a deterministic query: merge a 'delta' batch
    (every 3rd event, doubled value) into a 'base' snapshot (every 2nd
    event); matched keys take the delta value, new keys are inserted."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value", "event_type")
    base = ev.filter(F.col("event_id") % 2 == 0)
    delta = ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    )
    return merge_upsert(base, delta, key="event_id")
