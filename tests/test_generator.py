"""Deterministic generator (R20/R24): reproducibility + the reference's
distribution contract (` s3_uploader.py:27-95`)."""

import datetime as dt

from pyspark.sql import functions as F

from aws_etl_pipeline_spark.generator import (
    generate_historical,
    generate_transactions,
)


def test_deterministic_same_seed(spark):
    a = generate_transactions(spark, 200, seed=7).collect()
    b = generate_transactions(spark, 200, seed=7).collect()
    assert a == b
    c = generate_transactions(spark, 200, seed=8).collect()
    assert a != c


def test_distribution_contract(spark):
    df = generate_transactions(spark, 2000, date=dt.date(2024, 3, 15), seed=42)
    rows = df.collect()
    assert len(rows) == 2000
    # 30/70 income/expense split (±5pp at n=2000)
    n_income = sum(1 for r in rows if r.transaction_type == "income")
    assert 0.25 < n_income / 2000 < 0.35
    for r in rows:
        if r.transaction_type == "income":
            assert 500 <= r.amount <= 5000
            assert r.category in ("salary", "freelance", "investment", "bonus")
        else:
            assert -500 <= r.amount <= -10
        # TXN_YYYYMMDD_NNNN id format (` s3_uploader.py:84`)
        assert r.transaction_id.startswith("TXN_20240315_")
        # time jitter window 06:00-22:59 (` s3_uploader.py:78-81`)
        hour = int(r.timestamp[11:13])
        assert 6 <= hour <= 22


def test_ids_unique(spark):
    df = generate_transactions(spark, 500, seed=1)
    assert df.select("transaction_id").distinct().count() == 500


def test_historical_backfill(spark):
    df = generate_historical(spark, days_back=3, end_date=dt.date(2024, 3, 15))
    days = {r.date for r in df.select("date").distinct().collect()}
    assert days == {"2024-03-15", "2024-03-14", "2024-03-13"}
    per_day = df.groupBy("date").count().collect()
    assert all(20 <= r["count"] <= 100 for r in per_day)
