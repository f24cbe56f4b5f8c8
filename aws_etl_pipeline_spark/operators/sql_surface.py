"""SQL-API surface (SURVEY §2B): subqueries, CTEs, unpivot, sampling,
and change-tracking — operators most naturally spelled in SQL, run
through ``spark.sql`` over registered temp views (Catalyst produces
the same plans as the DataFrame API; this module also proves the
engine's SQL entry point end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice,
       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS dev_from_mean
FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in both projection and predicate
    (Catalyst evaluates it once and broadcasts the scalar)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4)
                 AS dev_from_mean
        FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "sql_correlated_exists",
    oracle="""
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_quantity > 49.5 AND l.l_discount > 0.09)
""",
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — decorrelated by Catalyst into
    semi/anti joins (SURVEY §4.2 subquery decorrelation)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey
                            AND l.l_quantity > 49.5 AND l.l_discount > 0.09)
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
""",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (note NOT IN's null-aware anti-join
    semantics — o_custkey has no nulls here, keeping both engines'
    three-valued logic aligned)."""
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
          AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        """
    )


@query(
    "sql_cte_chain",
    oracle="""
WITH big AS (
  SELECT o_custkey, count(*)::BIGINT AS n FROM orders
  WHERE o_totalprice > 200000 GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, n, dense_rank() OVER (ORDER BY n DESC)::BIGINT AS rnk FROM big
)
SELECT r.o_custkey, r.n, r.rnk, c.c_mktsegment
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
WHERE r.rnk <= 5
""",
)
def sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs feeding a join — the everyday analyst query shape."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH big AS (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders
          WHERE o_totalprice > 200000 GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, n, CAST(dense_rank() OVER (ORDER BY n DESC) AS BIGINT) AS rnk
          FROM big
        )
        SELECT r.o_custkey, r.n, r.rnk, c.c_mktsegment
        FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        WHERE r.rnk <= 5
        """
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-filter-sum — the query
    where predicate pushdown + row-group skipping do all the work."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "fn_unpivot",
    oracle="""
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey,
         'acctbal' AS m1, c_acctbal AS v1,
         'nationkey' AS m2, c_nationkey::DOUBLE AS v2
  FROM customer
) t, LATERAL (VALUES (t.m1, t.v1), (t.m2, t.v2)) u(metric, val)
""",
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack — the inverse of agg_pivot."""
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        " AS (metric, val)",
    )


@query(
    "sample_stable_hash",
    oracle="""
SELECT doc_id, text FROM documents
WHERE ('0x' || substr(md5('salt42:' || doc_id), 1, 8))::UBIGINT % 100 < 10
""",
)
def sample_stable_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample keyed on a salted content hash — the
    reproducible-sampling primitive for training-data pipelines
    (unlike df.sample, identical across runs, engines, partitionings)."""
    from ..api import stable_sample

    d = load_table(spark, sf_dir, "documents")
    return stable_sample(d, "doc_id", pct=10).select("doc_id", "text")


@query(
    "scd2_current_snapshot",
    oracle="""
WITH changes AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, ts AS valid_from, value AS current_value
FROM changes WHERE rn = 1
""",
)
def scd2_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/SCD-style current-state snapshot: latest change per key from
    an event log (the read side of a MERGE-based dimension table;
    full SCD2 interval building is the same window plus lead())."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("value").alias("current_value"),
        )
    )


@query(
    "scd2_intervals",
    oracle="""
SELECT user_id, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events WHERE event_type = 'signup'
""",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 effective-dating: each change opens an interval closed by
    the next change (valid_to null == current row)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        "value",
        nxt.isNull().alias("is_current"),
    )


_RECURSIVE_SQL = """
WITH RECURSIVE chain(seed_id, cur, depth) AS (
  SELECT p_partkey AS seed_id, p_partkey AS cur, 0 AS depth
  FROM part WHERE p_partkey % 40 = 0
  UNION ALL
  SELECT seed_id, cur - 157, depth + 1
  FROM chain WHERE cur - 157 >= 1 AND depth < 5
)
SELECT seed_id, max(depth)::BIGINT AS depth, min(cur) AS ancestor
FROM chain GROUP BY seed_id
"""


@query(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4.0): a depth-bounded
    hierarchy walk — every 40th part climbs a synthesized parent edge
    (parent = key - 157) up to 5 levels, the BOM-traversal / org-chart
    shape SQL engines answer with iterative union execution.

    Spark executes the recursion as an iterated plan whose working set
    is the FRONTIER (rows added last round), the same per-round
    frontier-sized state discipline as dedup_connected_components —
    each of the <= 5 rounds is one filter+projection over the frontier,
    so at 100 TB cost is rounds x frontier, never rounds x corpus. The
    depth guard is mandatory: an unguarded recursion over a synthetic
    key-arithmetic edge would iterate key-range-many times. DuckDB runs
    the identical statement (both engines are ANSI here), making the
    oracle the same text modulo the ::BIGINT cast spelling."""
    _views(spark, sf_dir, "part")
    return spark.sql(_RECURSIVE_SQL.replace("::BIGINT", ""))


@query(
    "sql_session_variables",
    oracle="""
SELECT c_mktsegment,
       count(*)::BIGINT AS n_rich,
       CAST(round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
            AS DOUBLE) AS bal_sum
FROM customer
WHERE c_acctbal > 900.0 AND c_mktsegment <> 'MACHINERY'
GROUP BY c_mktsegment
""",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 session variables + EXECUTE IMMEDIATE: the
    parameterized-SQL surface an orchestration layer uses to run one
    vetted statement text against many parameter sets without string
    interpolation (injection-safe binding, plan-cache-friendly).
    DECLARE + SET VARIABLE hold the parameters, the statement binds
    them with ``USING`` placeholders. The oracle inlines the same
    constants — so a binding bug (wrong order, type coercion) flips
    the hash. DuckDB has no session-variable dialect; the CONTRACT
    verified is the parameterized execution result, which is exactly
    the point of the feature."""
    _views(spark, sf_dir, "customer")
    spark.sql("DECLARE OR REPLACE VARIABLE min_bal DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE excluded_seg STRING DEFAULT ''")
    spark.sql("SET VARIABLE min_bal = 900.0")
    spark.sql("SET VARIABLE excluded_seg = 'MACHINERY'")
    return spark.sql(
        """
EXECUTE IMMEDIATE
 'SELECT c_mktsegment,
         count(*) AS n_rich,
         round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal_sum
  FROM customer
  WHERE c_acctbal > ? AND c_mktsegment <> ?
  GROUP BY c_mktsegment'
 USING min_bal, excluded_seg
"""
    )


@query(
    "sql_lateral_join",
    oracle="""
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, count(c.c_custkey)::BIGINT AS n_customers
  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) t
""",
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in the FROM clause (Spark 4 /
    SQL:1999): for each region, the top-2 nations by customer count —
    the 'top-N per outer row' idiom spelled as the SQL standard writes
    it, identical text on both engines.

    Catalyst decorrelates the lateral subquery into a ranked window
    over an equi-join (DomainJoin rewrite), so the executed plan is
    the same shuffle-once-rank-once shape as `topk_per_group` — the
    lateral syntax costs nothing over the window spelling; this query
    pins that equivalence."""
    _views(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, count(c.c_custkey) AS n_customers
  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) t
"""
    ).withColumn("n_customers", F.col("n_customers").cast("long"))
