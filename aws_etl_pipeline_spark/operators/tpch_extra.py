"""Additional TPC-H-shaped composite queries (SURVEY §2B relational
depth): correlated-min supplier selection (Q2 shape), nation-pair
volume shipping (Q7 shape), distinct-supplier part stats with NOT IN
exclusion (Q16 shape). The schema has no partsupp table, so supply
cost derives from lineitem unit prices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query



@query(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, round(unit_cost, 6) AS unit_cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rn
  FROM cost
)
SELECT p.p_partkey, p.p_brand, s.s_name, b.unit_cost
FROM best b
JOIN part p     ON b.l_partkey = p.p_partkey AND p.p_size = 15
JOIN supplier s ON b.l_suppkey = s.s_suppkey
WHERE b.rn = 1
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated min as a
    rank-1 window — one shuffle on partkey instead of a correlated
    subquery re-scan per part)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        ).alias("unit_cost")
    )
    w = W.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("unit_cost", F.round("unit_cost", 6))
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       year(l.l_shipdate)::BIGINT AS ship_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume per year — two
    broadcast dimension chains hanging off the fact-fact join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("volume")
        )
    )


@query(
    "q16_supplier_part_stats",
    oracle="""
SELECT p.p_brand, p.p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
  AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_size
""",
)
def q16_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per brand/size with a
    NOT-IN supplier exclusion (anti-join on the broadcast-able
    exclusion set)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
