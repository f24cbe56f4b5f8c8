"""Deterministic Spark-native transaction generator (reference R20/R24,
` s3_uploader.py:27-95,204-226`).

The reference builds rows one at a time in a Python loop with
``random.*``; here the same distribution is declared as seeded Catalyst
expressions over ``spark.range(n)`` — fully parallel, no driver loop,
reproducible for a given seed:

  * 30% income / 70% expense split (` s3_uploader.py:68`)
  * income:  category in {salary, freelance, investment, bonus},
    amount ~ U(500, 5000)   (` s3_uploader.py:70-72`)
  * expense: category/description pairs, amount ~ -U(10, 500)
    (` s3_uploader.py:73-75`)
  * per-row time jitter 06:00-22:59 (` s3_uploader.py:78-81`)
  * transaction_id format TXN_YYYYMMDD_NNNN (` s3_uploader.py:84`)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

INCOME_CATEGORIES = ("salary", "freelance", "investment", "bonus")
EXPENSE_PAIRS = (
    ("food", "Groceries"),
    ("food", "Restaurant"),
    ("transport", "Gas"),
    ("transport", "Public Transit"),
    ("utilities", "Electricity"),
    ("utilities", "Internet"),
    ("entertainment", "Streaming"),
    ("entertainment", "Movies"),
    ("shopping", "Clothes"),
    ("shopping", "Electronics"),
    ("healthcare", "Pharmacy"),
    ("healthcare", "Doctor"),
)
ACCOUNTS = ("checking", "savings", "credit_card")
LOCATIONS = ("Online", "New York", "Los Angeles", "Chicago", "Houston")


def _pick(options: tuple[str, ...], r) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (r * len(options) + 1).cast("int"))


def generate_transactions(
    spark: SparkSession,
    num_records: int = 50,
    date: dt.date | None = None,
    seed: int = 42,
) -> DataFrame:
    """Generate one day of synthetic transactions (R20)."""
    date = date or dt.date(2024, 3, 15)
    df = spark.range(num_records)
    r_split = F.rand(seed)
    r_cat = F.rand(seed + 1)
    r_amt = F.rand(seed + 2)
    r_time = F.rand(seed + 3)
    r_acct = F.rand(seed + 4)
    r_loc = F.rand(seed + 5)

    is_income = r_split < 0.3
    exp_cats = tuple(c for c, _ in EXPENSE_PAIRS)
    exp_descs = tuple(d for _, d in EXPENSE_PAIRS)

    date_lit = F.lit(date.strftime("%Y-%m-%d"))
    # jitter 06:00:00 .. 22:59:59 -> seconds offset in [21600, 82799]
    sec = (F.lit(21600) + (r_time * (82800 - 21600)).cast("int")).cast("int")
    ts = F.concat(
        date_lit,
        F.lit(" "),
        F.lpad((sec / 3600).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((sec % 3600) / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((sec % 60).cast("string"), 2, "0"),
    )

    return df.select(
        F.format_string(
            f"TXN_{date.strftime('%Y%m%d')}_%04d", F.col("id") + 1
        ).alias("transaction_id"),
        date_lit.alias("date"),
        ts.alias("timestamp"),
        F.round(
            F.when(is_income, 500 + r_amt * 4500).otherwise(-(10 + r_amt * 490)), 2
        ).alias("amount"),
        F.when(is_income, _pick(INCOME_CATEGORIES, r_cat))
        .otherwise(_pick(exp_cats, r_cat))
        .alias("category"),
        F.when(is_income, F.lit("Payment"))
        .otherwise(_pick(exp_descs, r_cat))
        .alias("description"),
        F.when(is_income, F.lit("income")).otherwise(F.lit("expense")).alias(
            "transaction_type"
        ),
        _pick(ACCOUNTS, r_acct).alias("account"),
        _pick(LOCATIONS, r_loc).alias("location"),
    )


def generate_historical(
    spark: SparkSession,
    days_back: int = 30,
    end_date: dt.date | None = None,
    seed: int = 42,
) -> DataFrame:
    """R24 backfill: one generate per day, unioned lazily (each day gets
    a distinct seed so rows differ, like the reference's fresh RNG per
    loop iteration, ` s3_uploader.py:204-226`)."""
    end_date = end_date or dt.date(2024, 3, 15)
    frames = []
    for i in range(days_back):
        day = end_date - dt.timedelta(days=i)
        # 20-100 rows/day (` s3_uploader.py:217`), deterministically varied
        n = 20 + (hash((seed, i)) % 81)
        frames.append(generate_transactions(spark, n, day, seed + i))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@query("gen_transactions")
def gen_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20 as a named query (rows-only: Spark's rand stream is not
    reproducible in SQL oracles; distribution properties are asserted
    in tests/test_generator.py)."""
    return generate_transactions(spark, num_records=1000)
