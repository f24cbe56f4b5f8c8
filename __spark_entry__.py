"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``aws_etl_pipeline_spark`` package; this
module just adapts its query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_etl_pipeline_spark.registry import all_queries
from aws_etl_pipeline_spark.session import ensure_engine_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's composite ETL pipeline (SURVEY §2A
    R1->R3->R4..R14, `lambda_function.py:40-50`) re-expressed as one
    lazy Catalyst-optimized DataFrame chain.
    """
    ensure_engine_confs(spark)
    from aws_etl_pipeline_spark.operators.etl import etl_flagship

    return etl_flagship(spark, "/root/testdata/sf0.001")


def _with_cache_sweep(fn: Callable[[SparkSession, str], DataFrame]):
    """Unpersist the PREVIOUS query's tracked blocks before building
    the next plan (cache.clear_persisted docstring) — by the time the
    driver asks for query N, query N-1's result has been collected, so
    its pinned intermediates are dead weight in executor memory."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aws_etl_pipeline_spark.cache import clear_persisted

        clear_persisted()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_cache_sweep(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query; rows-only
    queries (streaming/state/approximate ops) are omitted."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
