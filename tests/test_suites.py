"""Family digest suite machinery (operators/suites.py): the
cross-engine canonicalization must agree byte-for-byte, including the
edge cases the member queries happen not to hit."""

import duckdb
from pyspark.sql import functions as F

from aws_etl_pipeline_spark.registry import all_queries

all_queries()  # populate member registrations BEFORE suites import

from aws_etl_pipeline_spark.operators.suites import (  # noqa: E402
    SUITES,
    _digest_spark,
    _digest_sql,
)


def _duck_digest(sql: str) -> tuple:
    return duckdb.sql(sql).fetchall()[0]


def test_empty_relation_digest_matches(spark):
    # 0-row branch: Spark md5(concat_ws('', [])) vs DuckDB
    # md5(coalesce(string_agg(...), '')) must both land on md5('').
    cols = [("k", "int"), ("v", "float")]
    df = spark.createDataFrame([], "k long, v double")
    got = _digest_spark(df, "b", cols).first()
    want = _duck_digest(_digest_sql("SELECT 1 AS k, 1.0 AS v WHERE false", "b", cols))
    assert (got.branch, got.n_rows, got.digest) == want


def test_null_and_value_kinds_match(spark):
    # one row exercising every kind incl. NULLs, NaN, negative floats,
    # date/timestamp — the full canonicalization matrix.
    df = spark.createDataFrame(
        [
            (1, None, -1.5, float("nan"), True, None),
            (None, "x|y", 0.25, 2.0, None, "2024-03-15 12:30:45"),
        ],
        "k long, s string, f double, g double, b boolean, t string",
    ).select(
        "k", "s", "f", "g", "b", F.col("t").cast("timestamp").alias("t")
    )
    cols = [
        ("k", "int"),
        ("s", "str"),
        ("f", "float"),
        ("g", "float"),
        ("b", "bool"),
        ("t", "ts"),
    ]
    got = _digest_spark(df, "m", cols).first()
    oracle = """
    SELECT * FROM (VALUES
      (1, NULL, -1.5, 'NaN'::DOUBLE, true, NULL::TIMESTAMP),
      (NULL, 'x|y', 0.25, 2.0, NULL, TIMESTAMP '2024-03-15 12:30:45')
    ) t(k, s, f, g, b, t)
    """
    want = _duck_digest(_digest_sql(oracle, "m", cols))
    assert (got.branch, got.n_rows, got.digest) == want


def test_all_suite_members_have_oracles_and_specs(spark):
    qs = all_queries()
    from aws_etl_pipeline_spark.operators._digest_spec import COLSPEC

    for suite, members in SUITES.items():
        for m in members:
            assert m in qs, f"{suite}: {m} unregistered"
            assert qs[m].oracle is not None, f"{suite}: {m} has no oracle"
            assert m in COLSPEC, f"{suite}: {m} missing digest spec"
