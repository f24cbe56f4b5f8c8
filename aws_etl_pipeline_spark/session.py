"""SparkSession factory.

Local-mode defaults mirror the cluster profile we design for: AQE with
partition coalescing and skew-join handling on, shuffle parallelism
sized to cores (not the 200 default), UTC session timezone (so date
logic agrees with the UTC-naive DuckDB oracle), Arrow enabled for the
pandas-UDF path, and the legacy nanos-as-long parquet shim (the
driver-generated ``events`` table stores TIMESTAMP(NANOS), which Spark
otherwise refuses to read; see catalog.load_table for the ns->us
conversion).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_NAME = "aws-etl-pipeline-spark"

#: SQL confs that are runtime-settable and required for correct reads —
#: applied defensively to *any* session handed to us (the verify driver
#: builds its own SparkSession).
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Null-on-error cast semantics (reference uses pandas errors='coerce';
    # ANSI would raise instead).
    "spark.sql.ansi.enabled": "false",
    # Split size stays at the 128 MB default: at bench SF the per-query
    # data (~20 MB) is below one split, and forcing smaller splits was
    # measured to cost more in task scheduling than it buys in
    # parallelism. Compute-bound operators spread explicitly instead
    # (catalog.load_spread); scan-bound ones are IO-trivial here and
    # split naturally at production file sizes.
}


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment; proceed with defaults
    try:
        # A session we didn't build (the verify driver's bare
        # SparkSession) keeps the 200-partition shuffle default; size it
        # to the actual parallelism instead — AQE still coalesces below
        # this, it is only the upper bound / initial task count.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = ENGINE_NAME,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (or 4). On a real cluster the
    master/memory settings come from spark-submit; everything set here is
    also cluster-safe.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_engine_confs(spark)
