"""Set operations (SURVEY §2B): union all/distinct, intersect, except,
and the multiset ALL variants.

Spark resolves union columns positionally; the engine standardizes on
``unionByName`` so schema evolution can't silently misalign columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@query(
    "set_union_all",
    oracle="""
SELECT nationkey, count(*)::BIGINT AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle) — aggregated so the
    multiset multiplicity is what gets verified."""
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT == unionByName + distinct (hash-dedup shuffle)."""
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, null-safe equality)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set_except",
    oracle="""
SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer)
EXCEPT
SELECT nationkey FROM (
  SELECT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 20
)
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): subtract removes every left row that
    appears in the right side at all."""
    return _cust_nations(spark, sf_dir).subtract(
        _supp_nations(spark, sf_dir).filter(F.col("nationkey") < 20)
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_linenumber = 2
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset intersection (min of multiplicities)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_linenumber = 2
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference (multiplicity subtraction)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (hash-dedup; at scale this is a
    shuffle on all projected columns — prefer dropDuplicates(subset)
    when a key subset suffices)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@query(
    "set_union_by_name",
    oracle="""
SELECT doc_id, lang, NULL AS source, n_chars FROM documents
UNION ALL BY NAME
SELECT doc_id, source FROM documents
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two corpus slices with DIFFERENT column
    sets merge by NAME, missing columns null-filled
    (``unionByName(allowMissingColumns=True)``) — how a multi-source
    training corpus with drifting schemas concatenates without a
    rewrite. Positional UNION would silently misalign columns; by-name
    union is order-insensitive and total (null-complete), and costs no
    shuffle — it is pure plan-level concatenation."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", "lang", "n_chars")
    b = d.select("doc_id", "source")
    return a.unionByName(b, allowMissingColumns=True).select(
        "doc_id", "lang", "source", "n_chars"
    )
