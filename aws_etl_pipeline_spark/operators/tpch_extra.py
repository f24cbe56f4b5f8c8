"""Additional TPC-H-shaped composite queries (SURVEY §2B relational
depth): correlated-min supplier selection (Q2 shape), nation-pair
volume shipping (Q7 shape), distinct-supplier part stats with NOT IN
exclusion (Q16 shape). The schema has no partsupp table, so supply
cost derives from lineitem unit prices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import track
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
    """TPC-H Q7 shape: cross-nation trade volume per year.

    Join order is dims-first: the 2-of-25-nations filter reduces
    customer to ~8%, then orders to the orders of those customers,
    BEFORE anything touches lineitem — so the fact table is consumed
    in one scan with two hash probes and the only shuffle left is the
    tiny final groupBy (24% faster than the l⋈o-first plan at sf0.1,
    where the full orders shuffle dominated). Scale note: the
    ``broadcast(o2)`` hint assumes the reduced orders side fits the
    broadcast budget; past that (orders ~8% of a 100 TB fact), drop
    the hint and AQE picks shuffle-hash vs broadcast from runtime
    sizes — the dims-first reduction itself is what holds at any SF."""
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
    c2 = c.join(F.broadcast(cn), c.c_nationkey == F.col("cn_key")).select(
        "c_custkey", "cust_nation"
    )
    o2 = o.join(F.broadcast(c2), o.o_custkey == c2.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    s2 = s.join(F.broadcast(sn), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    return (
        l.join(F.broadcast(o2), l.l_orderkey == o2.o_orderkey)
        .join(F.broadcast(s2), l.l_suppkey == s2.s_suppkey)
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


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered priority counts (semi join on
    the fact table feeding a small aggregate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q12_shipmode_priority",
    oracle="""
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-count aggregation over a fact-fact
    join (the schema has no shipmode column; linestatus plays its role)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE), 8) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share — conditional decimal
    sums ratioed into one scalar."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 8
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big      ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a join. The
    textbook plan (and the oracle SQL) re-joins lineitem to recompute
    sum(l_quantity) per surviving order, but that sum IS the HAVING
    aggregate — so we reuse it and skip the second lineitem shuffle
    entirely: one pass over the fact table instead of two."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("q").cast("double").alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides —
    the predicate-pushdown stress test (the equi key still carries the
    join; the disjunction is a residual filter)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers with returned
    items — join, aggregate, deterministic top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer
    (left join keeps zero-order customers), then the distribution of
    those counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue 'view' + max-selection (the scalar
    subquery over the derived aggregate)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly
FROM lineitem l
JOIN part p    ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < a.half_avg
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated-average threshold (rows below half
    their part's mean quantity) via a pre-aggregated join instead of a
    per-row correlated subquery. avg() is float on both sides; the
    comparison threshold is identical double arithmetic."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH eligible AS (
  SELECT c_custkey, c_acctbal, (c_nationkey % 7) AS cntry
  FROM customer
  WHERE (c_nationkey % 7) IN (1, 2, 3)
),
threshold AS (
  SELECT avg(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0
)
SELECT e.cntry::BIGINT AS cntry, count(*)::BIGINT AS numcust,
       CAST(sum(CAST(e.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM eligible e CROSS JOIN threshold t
WHERE e.c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY e.cntry
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, grouped by country bucket (no phone column in this schema:
    nationkey%7 plays the country-code IN filter; 'no orders at all'
    is empty at sf0.01 — every customer has orders)."""
    c = load_table(spark, sf_dir, "customer")
    eligible = c.select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 7).alias("cntry")
    ).filter(F.col("cntry").isin(1, 2, 3))
    threshold = eligible.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        eligible.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("cntry").cast("long").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias(
                "totacctbal"
            ),
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH base AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  JOIN region r   ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year::BIGINT AS o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 8) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of region revenue per
    year — conditional share of a decimal-exact total."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_reg") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return base.groupBy(F.col("o_year").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(nation_vol).cast("double") / F.sum("volume").cast("double"), 8
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * l.l_quantity * p.p_retailprice AS DECIMAL(18,6)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, year(o.o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year (no partsupp
    table in this schema: 60% of retail price stands in for supply
    cost)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("l_quantity") * F.col("p_retailprice")
    ).cast("decimal(18,6)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM val
WHERE value * 1000 > (SELECT sum(value) FROM val)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose one-nation shipped value exceeds a
    fraction of that nation's total — HAVING over a scalar subquery on
    the same aggregate (no partsupp table: lineitem value for NATION_1
    suppliers stands in for stock value). The threshold compare is
    value*1000 > total, pure decimal arithmetic, so both engines agree
    bit-exactly. The aggregate is computed once and persisted; the
    scalar total broadcasts back over it."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    val = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
               l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
        .transform(track)
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q20_potential_promotion",
    oracle="""
WITH shipped AS (
  SELECT l.l_suppkey,
         sum(CASE WHEN year(l.l_shipdate) = 1997
                  THEN CAST(l.l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty97,
         sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty_all
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
  GROUP BY l.l_suppkey
)
SELECT s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE 5 * qty97 > qty_all)
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain — suppliers in one
    region who concentrated their 'gear' volume in the target year
    (no partsupp availqty: >20% of lifetime volume shipped in 1997 —
    the data spans 7 years, so flat shipping is ~14% — plays the
    half-of-availqty threshold). Spark expresses both INs as semi
    joins; part and the qualifying-supplier set broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey, "left_semi"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1997, qty).otherwise(zero)).alias("qty97"),
            F.sum(qty).alias("qty_all"),
        )
        .filter(5 * F.col("qty97") > F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(shipped), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name")
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM lineitem l1
JOIN orders o   ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
""",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders (late = shipped >60 days after order date; no receipt/commit
    dates in this schema). The classic EXISTS + NOT-EXISTS double
    self-join is re-expressed as one aggregation per order — distinct
    suppliers and distinct LATE suppliers — then a filter for
    nsupp > 1 AND nlate == 1; one shuffle of lineitem instead of three
    correlated scans, which is the plan that survives at 100 TB."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    li = l.join(
        o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")
    ).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("nlate"),
    )
    return (
        li.filter("is_late")
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
