"""Explicit StructType schemas.

The engine never relies on schema inference in its core paths (the
reference infers everything via pd.read_csv, `lambda_function.py:84`;
we treat inference as a convenience option only).

Two schema groups:
  * TRANSACTIONS_* — the reference's financial-transaction data model,
    from the generator record shape (` s3_uploader.py:83-93`) and the
    Redshift DDL (`lambda_function.py:197-217`).
  * TESTDATA — the driver-provided TPC-H-ish tables (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference transaction model (raw, pre-transform) -----------------------
# 9 generator fields, ` s3_uploader.py:83-93`. `date`/`timestamp` arrive as
# strings in CSV; the ETL pipeline casts them (R5/R6).
TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("transaction_type", T.StringType(), True),
        T.StructField("account", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
    ]
)

# Post-transform columns added by the flagship pipeline (R7-R13; Redshift DDL
# `lambda_function.py:197-217` is the typed source of truth).
TRANSACTIONS_TRANSFORMED = T.StructType(
    list(TRANSACTIONS_RAW.fields)
    + [
        T.StructField("processed_timestamp", T.TimestampType(), True),
        T.StructField("processed_by", T.StringType(), True),
        T.StructField("amount_category", T.StringType(), True),
        T.StructField("amount_abs", T.DoubleType(), True),
        T.StructField("day_of_week", T.StringType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("year", T.IntegerType(), True),
    ]
)

# --- Driver testdata tables (FIXTURES.md §B) --------------------------------
TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA)
