"""MERGE upsert semantics (R17): conflict policy + idempotent replay."""

from pyspark.sql import functions as F

from aws_etl_pipeline_spark.operators.upsert import merge_into_parquet, merge_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "transaction_id string, amount double, note string")


def test_merge_updates_and_inserts(spark):
    target = _df(spark, [("T1", 10.0, "old"), ("T2", 20.0, "keep")])
    source = _df(spark, [("T1", 99.0, "new"), ("T3", 30.0, "ins")])
    out = {r.transaction_id: r for r in merge_upsert(target, source, "transaction_id").collect()}
    assert out["T1"].amount == 99.0 and out["T1"].note == "new"  # matched -> update
    assert out["T2"].amount == 20.0  # unmatched target -> kept
    assert out["T3"].amount == 30.0  # unmatched source -> insert
    assert len(out) == 3


def test_merge_update_subset_of_columns(spark):
    # reference updates only amount + processed_timestamp on conflict
    # (`lambda_function.py:226-235`); other columns keep target values
    target = _df(spark, [("T1", 10.0, "orig")])
    source = _df(spark, [("T1", 99.0, "should-not-apply")])
    row = merge_upsert(target, source, "transaction_id", update_cols=("amount",)).first()
    assert row.amount == 99.0
    assert row.note == "orig"


def test_merge_replay_idempotent(spark, tmp_path):
    path = str(tmp_path / "txn")
    batch = _df(spark, [("T1", 10.0, "a"), ("T2", 20.0, "b")])
    merge_into_parquet(batch, path, key="transaction_id")
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    # replaying the identical batch must not change the table
    merge_into_parquet(batch, path, key="transaction_id")
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second
    # an updated batch changes exactly the matched row
    merge_into_parquet(_df(spark, [("T2", 99.0, "b2")]), path, key="transaction_id")
    out = {r.transaction_id: r.amount for r in spark.read.parquet(path).collect()}
    assert out == {"T1": 10.0, "T2": 99.0}
