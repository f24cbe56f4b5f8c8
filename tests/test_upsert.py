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


def test_merge_null_overwrites_on_match(spark):
    # MERGE semantics: a matched source row with an explicit NULL in an
    # update column overwrites the target value (ON CONFLICT DO UPDATE
    # SET c = EXCLUDED.c) — match is keyed on key presence, not value.
    target = _df(spark, [("T1", 10.0, "orig")])
    source = _df(spark, [("T1", None, "new")])
    row = merge_upsert(target, source, "transaction_id").first()
    assert row.amount is None
    assert row.note == "new"


def test_merge_insert_fills_non_update_columns(spark):
    # with a restricted update policy, INSERTed rows still take the
    # whole source row (only matched rows restrict to update_cols)
    target = _df(spark, [("T1", 10.0, "orig")])
    source = _df(spark, [("T1", 99.0, "skip"), ("T2", 20.0, "full")])
    out = {
        r.transaction_id: r
        for r in merge_upsert(
            target, source, "transaction_id", update_cols=("amount",)
        ).collect()
    }
    assert out["T1"].note == "orig"  # matched: note not in update_cols
    assert out["T2"].note == "full"  # inserted: whole row
    assert out["T2"].amount == 20.0


def test_merge_best_effort_drops_bad_rows(spark):
    # reference tolerance loop (`lambda_function.py:258-260`): rows the
    # insert would reject (NULL PK, duplicate PK in batch) are skipped,
    # the batch proceeds; last-writer-wins within the batch.
    target = _df(spark, [("T1", 10.0, "orig")])
    source = _df(
        spark,
        [(None, 5.0, "nullkey"), ("T2", 1.0, "a"), ("T2", 2.0, "b"), ("T1", 99.0, "up")],
    )
    out = {
        r.transaction_id: r
        for r in merge_upsert(
            target, source, "transaction_id", best_effort=True
        ).collect()
    }
    assert set(out) == {"T1", "T2"}
    assert out["T1"].amount == 99.0
    assert out["T2"].amount in (1.0, 2.0)  # deterministic pick, one of the batch


def test_staging_merge_sql_reference_policy():
    from aws_etl_pipeline_spark.operators.upsert import staging_merge_sql

    sql = staging_merge_sql(
        "portfolio_transactions",
        "portfolio_transactions_staging",
        "transaction_id",
        ["transaction_id", "amount", "processed_timestamp"],
        update_cols=("amount", "processed_timestamp"),
    )
    assert "MERGE INTO portfolio_transactions t" in sql
    # staging-side references are quoted (Spark's JDBC writer quotes
    # the staging columns it creates); target-side stay unquoted.
    assert 'amount = s."amount"' in sql
    assert 'processed_timestamp = s."processed_timestamp"' in sql
    update_clause = sql.split("UPDATE SET")[1].split("WHEN NOT MATCHED")[0]
    assert "transaction_id" not in update_clause  # key never updated
    assert "WHEN NOT MATCHED THEN INSERT" in sql
