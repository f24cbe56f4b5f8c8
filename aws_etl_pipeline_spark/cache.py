"""Session-scoped registry of persisted DataFrames.

Several operators pin an intermediate with ``persist()`` because it
feeds multiple branches of one query plan (LSH band rows, IVF norm
tables, k-means centroids, graph edge lists). Spark keeps those blocks
until the SparkContext dies, so a harness session that runs the whole
registry back-to-back used to accumulate every query's cache for the
lifetime of the session (round-6 advice).

``track(df)`` is the drop-in replacement for ``df.persist()``: it
persists and records the DataFrame. ``clear_persisted()`` unpersists
everything recorded — the harness boundaries call it BETWEEN queries
(never inside one: a query's returned plan still references its
tracked intermediates until its action has run):

  * ``__spark_entry__.queries()`` wraps each callable to clear the
    previous query's blocks before building the next plan;
  * ``bench.py`` clears after each timed rep's ``count()``;
  * ``tools/check.py`` clears after each query/oracle comparison.

Unpersisting is always correctness-neutral (a cleared plan recomputes),
so a stray early clear can cost time but never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for the next harness-boundary
    :func:`clear_persisted` sweep."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def clear_persisted() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns how
    many were cleared. Safe to call at any time — worst case a plan
    recomputes."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n
