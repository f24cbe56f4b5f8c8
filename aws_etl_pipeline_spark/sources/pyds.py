"""Spark 4 Python DataSource — the reference's synthetic transaction
generator (` s3_uploader.py:27-95`) re-expressed as a FIRST-CLASS
pluggable source instead of a driver-side script: `spark.read.format(
"synthetic_txns")` plans real input partitions, each executor
generates its stride independently, and the result composes with
every downstream operator like any other scan.

Why this exists beyond `generator.py` (the Catalyst-expression
generator, which stays the fast path): the Python DataSource API is
the extensibility surface a real deployment uses for custom
connectors (internal services, proprietary formats) — this module
pins the full lifecycle (name/schema/reader/partitions/read,
registration, stride partition planning) with a HASH-VERIFIABLE
generator: every cell derives from md5 over a column-tagged key, the
same device the sketch family uses for cross-engine parity, so the
DuckDB oracle reproduces the source bit-for-bit and the driver hash
is a hard verdict on the whole lifecycle.

Per-row Python is the known cost of this surface (it IS a Python
source); bulk connectors use the same API with Arrow batches
(DataSourceArrowWriter / pandas yield) — the partition planning
pinned here is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query

#: fixed generation size: the source is sf-independent (like
#: gen_transactions) but fully deterministic, so it IS oracle-checked.
PYDS_ROWS = 2000
PYDS_PARTS = 8
PYDS_CATS = ("grocery", "fuel", "online", "travel", "dining")


def _h15(tag: str, txn_id: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{tag}:{txn_id}".encode()).hexdigest()[:15], 16)


try:  # pragma: no cover — exercised under Spark 4's datasource module
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticTxnsDataSource(DataSource):
        """`format("synthetic_txns")` — options: rows, partitions."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_txns"

        def schema(self) -> str:
            return (
                "txn_id bigint, part_id bigint, user_id bigint, "
                "amount double, category string"
            )

        def reader(self, schema):  # noqa: ARG002 — fixed schema
            return _SyntheticTxnsReader(self.options)

    class _SyntheticTxnsReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", PYDS_ROWS))
            self.parts = int(options.get("partitions", PYDS_PARTS))

        def partitions(self):
            # stride plan: partition p owns txn_id % parts == p — the
            # planner-visible parallelism contract (the jdbc
            # stride-ingest pattern), verified by the part_id column.
            return [InputPartition(p) for p in range(self.parts)]

        def read(self, partition):
            p = partition.value
            for txn_id in range(p, self.rows, self.parts):
                yield (
                    txn_id,
                    p,
                    _h15("usr", txn_id) % 10_000,
                    round((_h15("amt", txn_id) % 1_000_000) / 100.0, 2),
                    PYDS_CATS[_h15("cat", txn_id) % len(PYDS_CATS)],
                )

    _PYDS_AVAILABLE = True
except ImportError:  # pragma: no cover — pre-4.0 Spark
    _PYDS_AVAILABLE = False


def _cat_case_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(PYDS_CATS)
    )
    return (
        f"CASE (('0x' || substr(md5('cat:' || txn_id), 1, 15))::BIGINT "
        f"% {len(PYDS_CATS)}) {whens} END"
    )


@query(
    "scan_python_datasource",
    oracle=f"""
WITH ids AS (SELECT unnest(generate_series(0, {PYDS_ROWS - 1})) AS txn_id)
SELECT txn_id::BIGINT AS txn_id,
       (txn_id % {PYDS_PARTS})::BIGINT AS part_id,
       (('0x' || substr(md5('usr:' || txn_id), 1, 15))::BIGINT % 10000)
         AS user_id,
       round((('0x' || substr(md5('amt:' || txn_id), 1, 15))::BIGINT
              % 1000000) / 100.0, 2) AS amount,
       {_cat_case_sql()} AS category
FROM ids
""",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the registered Python data source end-to-end (register ->
    plan {PYDS_PARTS} stride partitions -> executor-side generation)
    and hash-verify every cell against the DuckDB twin of the md5
    derivations — including `part_id`, which pins that the PLANNED
    partition layout (txn_id % partitions) is the one that actually
    executed. sf_dir is unused: the source is its own data."""
    del sf_dir
    if not _PYDS_AVAILABLE:  # pragma: no cover
        raise RuntimeError("Python DataSource API requires Spark >= 4.0")
    try:
        spark.dataSource.register(SyntheticTxnsDataSource)
    except Exception:  # already registered in this session
        pass
    return (
        spark.read.format("synthetic_txns")
        .option("rows", PYDS_ROWS)
        .option("partitions", PYDS_PARTS)
        .load()
    )
