"""Named-query registry.

Every operator the engine claims is registered here as a ``Query``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL twin over the same
parquet tables. The driver's correctness gate runs both sides at
sf=0.01 and hash-compares row count + schema + order-insensitive
values, so:

  * every computed column is aliased identically on both sides;
  * float aggregates are rounded on both sides (summation order differs
    between a parallel Spark agg and DuckDB — raw doubles won't match
    bit-for-bit);
  * integer aggregates are pinned to BIGINT on both sides (DuckDB sums
    integers into HUGEINT, Spark into LONG).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register ``fn`` as the named query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all operator modules (populating the registry) and return it."""
    from .operators import etl, relational, setops, sql_surface, tpch_extra, windows, upsert  # noqa: F401
    from .functions import scalar, udfs  # noqa: F401
    from .sources import scans  # noqa: F401
    from .streaming import batch_windows, ingest  # noqa: F401
    from .llm import assembly, dedup, similarity, text, multimodal  # noqa: F401
    from . import generator  # noqa: F401

    return dict(_REGISTRY)
