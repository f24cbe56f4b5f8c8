"""Tabular feature-engineering operators (SURVEY §2B breadth): the
encodings a model-training pipeline computes over warehouse tables
before handing rows to a trainer.

Both operators here share one scale shape: the heavy relation is
scanned, reduced to a CATEGORY-CARDINALITY-sized statistics table
(exact integer sums, map-side combined), and the statistics are
broadcast back into a second scan-fused pass. The tempting
alternative — a window partitioned by the category — is rejected on
purpose: with a handful of categories it shuffles the entire table
into that many partitions (the skew anti-pattern); two scans with a
broadcast join in between keep every stage fully parallel at 100 TB.

Label discipline: the binary target is derived from columns
(o_orderstatus = 'F'), sums over it are exact BIGINTs, and every
ratio is computed from those integer sums on both engines, so the
encodings are identical doubles before the final round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

__all__ = [
    "feature_target_encode_loo",
    "feature_woe_iv",
]

#: additive-smoothing pseudo-count toward the global prior in the
#: leave-one-out encoding (the standard m-estimate).
TE_SMOOTH_M = 10

#: Laplace mass added to each class count in WoE (avoids ln(0) for
#: pure categories).
WOE_SMOOTH = 0.5


@query(
    "feature_target_encode_loo",
    oracle=f"""
WITH lab AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
cat AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n_cat, sum(y)::BIGINT AS y_cat
  FROM lab GROUP BY 1
),
gstats AS (
  SELECT sum(y_cat)::DOUBLE / sum(n_cat) AS prior FROM cat
)
SELECT l.o_orderkey, l.o_orderpriority, l.y::BIGINT AS y,
       round((c.y_cat - l.y + {TE_SMOOTH_M} * g.prior)
             / (c.n_cat - 1 + {TE_SMOOTH_M}), 6) AS te_loo
FROM lab l
JOIN cat c ON c.o_orderpriority = l.o_orderpriority
CROSS JOIN gstats g
""",
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of ``o_orderpriority`` against the
    finished-order label, with m-estimate smoothing toward the global
    prior: te_i = (sum_y(cat) - y_i + m*prior) / (n(cat) - 1 + m).

    Excluding the row's own label is what makes the encoding usable as
    a TRAINING feature (plain category-mean encoding leaks the target
    into itself — the classic CV contamination); smoothing keeps rare
    categories from collapsing onto their own noise. Plan: one scan
    reduces orders to a 5-row (category, n, sum_y) table of exact
    BIGINTs, the global prior folds from it, and both broadcast into a
    second scan-fused pass that computes every row's encoding with
    pure arithmetic — no per-category window, no wide shuffle, no
    Python. Reference scope: the feature step a warehouse user runs
    between `lambda_function.py:176`'s load and a trainer.
    """
    orders = load_table(spark, sf_dir, "orders")
    lab = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cat = lab.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("y_cat"),
    )
    glob = cat.agg(
        (F.sum("y_cat").cast("double") / F.sum("n_cat")).alias("prior")
    )
    return (
        lab.join(F.broadcast(cat), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("y").cast("long").alias("y"),
            F.round(
                (F.col("y_cat") - F.col("y") + TE_SMOOTH_M * F.col("prior"))
                / (F.col("n_cat") - 1 + TE_SMOOTH_M),
                6,
            ).alias("te_loo"),
        )
    )


@query(
    "feature_woe_iv",
    oracle=f"""
WITH lab AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
cat AS (
  SELECT o_orderpriority, sum(y)::BIGINT AS pos, (count(*) - sum(y))::BIGINT AS neg
  FROM lab GROUP BY 1
),
tot AS (SELECT sum(pos)::BIGINT AS pos_tot, sum(neg)::BIGINT AS neg_tot FROM cat),
w AS (
  SELECT c.o_orderpriority, c.pos, c.neg,
         (c.pos + {WOE_SMOOTH}) / (t.pos_tot + {WOE_SMOOTH} * 5) AS ps,
         (c.neg + {WOE_SMOOTH}) / (t.neg_tot + {WOE_SMOOTH} * 5) AS ns
  FROM cat c CROSS JOIN tot t
),
w2 AS (
  SELECT o_orderpriority, pos, neg,
         round(ln(ps / ns), 6) AS woe,
         CAST(round((ps - ns) * ln(ps / ns), 6) AS DECIMAL(18,6)) AS iv_term
  FROM w
)
SELECT o_orderpriority, pos, neg, woe,
       CAST(iv_term AS DOUBLE) AS iv_term,
       CAST(CAST(sum(iv_term) OVER () AS DECIMAL(18,6)) AS DOUBLE) AS iv_total
FROM w2
""",
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value of
    ``o_orderpriority`` against the finished-order label — the
    credit-scoring standard for judging a categorical feature's
    predictive power (IV < 0.02: useless; > 0.3: strong).

    WoE_c = ln( P(c|pos) / P(c|neg) ) with Laplace-smoothed class
    shares; IV = sum_c (P(c|pos) - P(c|neg)) * WoE_c. All shares
    derive from exact BIGINT sums; ln runs on identical doubles and
    is ROUNDED before the IV terms are summed (DECIMAL-cast, so the
    5-term total is exact and order-free on both engines). One scan to
    a 5-row table; everything downstream is constant-size.
    """
    orders = load_table(spark, sf_dir, "orders")
    lab = orders.select(
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cat = lab.groupBy("o_orderpriority").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    tot = cat.agg(
        F.sum("pos").cast("long").alias("pos_tot"),
        F.sum("neg").cast("long").alias("neg_tot"),
    )
    w = cat.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "pos",
        "neg",
        ((F.col("pos") + WOE_SMOOTH) / (F.col("pos_tot") + WOE_SMOOTH * 5)).alias("ps"),
        ((F.col("neg") + WOE_SMOOTH) / (F.col("neg_tot") + WOE_SMOOTH * 5)).alias("ns"),
    )
    w2 = w.select(
        "o_orderpriority",
        "pos",
        "neg",
        F.round(F.log(F.col("ps") / F.col("ns")), 6).alias("woe"),
        F.round((F.col("ps") - F.col("ns")) * F.log(F.col("ps") / F.col("ns")), 6)
        .cast("decimal(18,6)")
        .alias("iv_term"),
    )
    from pyspark.sql import Window as W

    return w2.select(
        "o_orderpriority",
        "pos",
        "neg",
        "woe",
        F.col("iv_term").cast("double").alias("iv_term"),
        F.sum("iv_term")
        .over(W.partitionBy())
        .cast("decimal(18,6)")
        .cast("double")
        .alias("iv_total"),
    )
