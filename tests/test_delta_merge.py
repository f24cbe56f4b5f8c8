"""End-to-end execution of the Delta Lake MERGE path (reference R17),
gated on delta-spark availability — the lakehouse twin of
tests/test_jdbc_merge.py's Derby gate.

This container ships no delta-spark (and installs are disallowed), so
these tests SKIP here; on any environment with the package + jars they
execute `merge_into_delta` for real: initial load, transactional
MERGE INTO, idempotent replay, and the reference's partial-update-cols
conflict policy. The skip is an import probe, not a silent pass — the
day the environment gains delta-spark these run without edits.
"""

import pytest

from aws_etl_pipeline_spark.operators.upsert import (
    _DELTA_AVAILABLE,
    merge_into_delta,
)

needs_delta = pytest.mark.skipif(
    not _DELTA_AVAILABLE,
    reason="delta-spark not importable in this container (installs "
    "disallowed); the JDBC MERGE twin is executed against Derby in "
    "tests/test_jdbc_merge.py instead",
)


def _rows(spark, path):
    return [
        tuple(r)
        for r in spark.read.format("delta").load(path).orderBy("ID").collect()
    ]


@needs_delta
def test_merge_into_delta_end_to_end(spark, tmp_path):
    path = str(tmp_path / "delta_txn")
    base = spark.createDataFrame(
        [(1, 10.0, "keep"), (2, 20.0, "stale"), (3, 30.0, "stale")],
        "ID INT, AMOUNT DOUBLE, NOTE STRING",
    )
    merge_into_delta(base, path, key="ID")  # initial load

    source = spark.createDataFrame(
        [(2, 200.0, "fresh"), (3, 300.0, "fresh"), (4, 400.0, "new")],
        "ID INT, AMOUNT DOUBLE, NOTE STRING",
    )
    merge_into_delta(source, path, key="ID")
    want = [
        (1, 10.0, "keep"),
        (2, 200.0, "fresh"),
        (3, 300.0, "fresh"),
        (4, 400.0, "new"),
    ]
    assert _rows(spark, path) == want

    # Idempotent replay — same batch, same result, no duplicate keys.
    merge_into_delta(source, path, key="ID")
    assert _rows(spark, path) == want


@needs_delta
def test_merge_into_delta_partial_update_cols(spark, tmp_path):
    path = str(tmp_path / "delta_txn2")
    base = spark.createDataFrame(
        [(1, 1.0, "orig")], "ID INT, AMOUNT DOUBLE, NOTE STRING"
    )
    merge_into_delta(base, path, key="ID")
    source = spark.createDataFrame(
        [(1, 9.0, "SHOULD_NOT_LAND"), (2, 2.0, "inserted")],
        "ID INT, AMOUNT DOUBLE, NOTE STRING",
    )
    merge_into_delta(source, path, key="ID", update_cols=("AMOUNT",))
    assert _rows(spark, path) == [(1, 9.0, "orig"), (2, 2.0, "inserted")]


def test_delta_guard_raises_without_runtime(spark):
    # NOT gated: when the runtime is absent the guard itself must fail
    # loudly, never silently no-op.
    if _DELTA_AVAILABLE:
        pytest.skip("delta available — guard not reachable")
    df = spark.createDataFrame([(1, 1.0)], "ID INT, V DOUBLE")
    with pytest.raises(RuntimeError, match="delta-spark"):
        merge_into_delta(df, "/tmp/nonexistent_delta", key="ID")
