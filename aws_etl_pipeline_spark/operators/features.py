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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load_table
from ..registry import query

__all__ = [
    "feature_target_encode_loo",
    "feature_woe_iv",
    "feature_quantile_binning",
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


#: equi-depth binning: number of bins over the c_acctbal feature.
QBIN_Q = 10

_QBIN_HIST_SQL = """
hist AS (
  SELECT c_acctbal AS v, count(*)::BIGINT AS c FROM customer GROUP BY 1
),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS cum FROM hist
),
tot AS (SELECT count(*)::BIGINT AS n FROM customer)
"""


def _qbin_oracle() -> str:
    ks = range(1, QBIN_Q)
    bcols = ", ".join(
        f"max(CASE WHEN k = {k} THEN b END) AS b{k}" for k in ks
    )
    binexpr = " + ".join(f"(c_acctbal > b{k})::INT" for k in ks)
    return f"""
WITH {_QBIN_HIST_SQL},
bounds AS (
  SELECT k, min(v) AS b
  FROM cum, tot, (SELECT unnest(range(1, {QBIN_Q})) AS k)
  WHERE cum >= (k * n + {QBIN_Q - 1}) // {QBIN_Q}
  GROUP BY k
),
brow AS (SELECT {bcols} FROM bounds),
binned AS (
  SELECT c_acctbal, 1 + {binexpr} AS bin FROM customer, brow
)
SELECT bin, count(*)::BIGINT AS n,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_bal
FROM binned GROUP BY bin
"""


@query("feature_quantile_binning", oracle=_qbin_oracle())
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) feature binning — the discretization a
    training pipeline applies to heavy-tailed numerics — computed the
    way it must be at 100 TB: EXACT decile boundaries WITHOUT a global
    sort. `agg_percentile_exact` buffers and sorts each group inside
    one aggregate — fine per group, wrong for a whole-table sort-based
    ntile, which would funnel every row through one ordered partition.
    Here the table first collapses to a VALUE HISTOGRAM (group by the
    2-dp feature value — bounded by the value DOMAIN [-999.99,
    9999.99], ~1.1M rows max, regardless of corpus size), the ordered
    cumulative sum runs over that bounded relation (the one
    single-partition window, domain-sized by construction), and the
    PERCENTILE_DISC boundary for k/Q is the smallest value whose
    cumulative count reaches ceil(k*n/Q) — pure BIGINT arithmetic,
    bit-identical across engines (no interpolation doubles to
    disagree on). The 9 boundaries broadcast back into a scan-fused
    comparison-sum projection; per-bin stats come from one map-side-
    combined aggregate. Two scans + one domain-bounded window: every
    stage except the tiny cumsum is fully parallel.

    Bin populations differ from n/Q only by tie mass at boundaries
    (boundary values are real data values; ties never split)."""
    cust = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    hist = cust.groupBy(F.col("c_acctbal").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = hist.select(
        "v",
        # global-ok: distinct-value histogram, domain-bounded (see doc)
        F.sum("c").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    tot = cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ks = spark.range(1, QBIN_Q).select(F.col("id").cast("int").alias("k"))
    bounds = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .filter(
            F.col("cum")
            >= F.floor((F.col("k") * F.col("n") + (QBIN_Q - 1)) / QBIN_Q)
        )
        .groupBy("k")
        .agg(F.min("v").alias("b"))
    )
    brow = bounds.agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("b"))).alias(f"b{k}")
            for k in range(1, QBIN_Q)
        ]
    )
    bin_col = F.lit(1)
    for k in range(1, QBIN_Q):
        bin_col = bin_col + (F.col("c_acctbal") > F.col(f"b{k}")).cast("int")
    binned = cust.crossJoin(F.broadcast(brow)).select(
        "c_acctbal", bin_col.alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_bal"),
    )


HASH_DIM = 64  # feature-vector width (buckets)
HASH_DOC_MOD = 13  # emit vectors for the deterministic 1/13 doc sample


@query(
    "feature_hashing_trick",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
  FROM documents WHERE doc_id % {HASH_DOC_MOD} = 0
)
SELECT doc_id,
       (('0x' || substr(md5(term), 1, 8))::UBIGINT % {HASH_DIM})::BIGINT
         AS bucket,
       count(*)::BIGINT AS tf,
       count(DISTINCT term)::BIGINT AS n_terms
FROM tok
GROUP BY doc_id, bucket
""",
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text vectorization (Weinberger et al. 2009; the
    fastText / Vowpal Wabbit input layer): every term maps to
    md5(term) % {HASH_DIM} — NO vocabulary is built, so the
    vectorizer is stateless, streaming-safe, and identical across
    training and serving (the vocabulary-drift failure mode of
    dictionary encoders disappears). Emits each sampled document's
    sparse (bucket, tf) features plus the per-bucket distinct-term
    count, which IS the collision audit ({HASH_DIM} buckets over a
    corpus vocabulary collide by design; n_terms > 1 rows quantify
    it). MLlib's HashingTF is the same idea with murmur3 — md5 here
    because both engines compute it bit-identically, which is what
    makes the vectorizer oracle-checkable.

    Plan: one explode + one (doc, bucket) map-side-combined aggregate
    over the pushed-down deterministic 1/{HASH_DOC_MOD} sample; no
    vocabulary state anywhere, which is the entire point."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % HASH_DOC_MOD == 0
    )
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("term"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % HASH_DIM
    )
    return tok.select("doc_id", bucket.alias("bucket"), "term").groupBy(
        "doc_id", "bucket"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )


RARE_MIN_SHARE = 0.01  # categories under this share collapse to __other__


@query(
    "feature_count_encode_rare",
    oracle=f"""
WITH counts AS (
  SELECT p_type AS category, count(*)::BIGINT AS n
  FROM part GROUP BY p_type
),
tot AS (SELECT sum(n)::DOUBLE AS total FROM counts),
collapsed AS (
  SELECT CASE WHEN n / total >= {RARE_MIN_SHARE} THEN category
              ELSE '__other__' END AS collapsed, category, n
  FROM counts CROSS JOIN tot
)
SELECT collapsed,
       count(*)::BIGINT AS n_source_categories,
       sum(n)::BIGINT AS n_rows,
       round(sum(n) / (SELECT total FROM tot), 6) AS freq_encoding
FROM collapsed GROUP BY collapsed
""",
)
def feature_count_encode_rare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count/frequency encoding with rare-category collapse: categories
    under {RARE_MIN_SHARE:.0%} corpus share fold into ``__other__``
    before the frequency becomes the feature — the standard guard that
    keeps one-row categories from minting unique (memorizable,
    leaky, serving-time-unseen) feature values. Complements
    `feature_target_encode_loo` (label-aware) and
    `feature_hashing_trick` (stateless): this is the label-FREE
    dictionary encoder with the long-tail handled.

    Plan: one category count (map-side combined over however many
    rows), a 1-row broadcast total, and a categories-sized collapse
    aggregate — the encoder table that ships to serving is
    category-count-sized, never data-sized."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy(F.col("p_type").alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).transform(track)  # collapse pass + total fold
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    collapsed = counts.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("n") / F.col("total") >= RARE_MIN_SHARE, F.col("category")
        )
        .otherwise("__other__")
        .alias("collapsed"),
        "n",
        "total",
    )
    return collapsed.groupBy("collapsed").agg(
        F.count(F.lit(1)).cast("long").alias("n_source_categories"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.sum("n") / F.max("total"), 6).alias("freq_encoding"),
    )


@query(
    "feature_quantile_normalize",
    oracle="""
WITH daily AS (
  SELECT l_shipdate AS d,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
         count(*)::DOUBLE AS n_items
  FROM lineitem GROUP BY l_shipdate
),
longf AS (
  SELECT d, 'qty' AS metric, qty AS value FROM daily
  UNION ALL SELECT d, 'revenue', revenue FROM daily
  UNION ALL SELECT d, 'n_items', n_items FROM daily
),
ranked AS (
  SELECT d, metric, value,
         row_number() OVER (PARTITION BY metric
                            ORDER BY value, d)::BIGINT AS rk
  FROM longf
),
ref AS (
  SELECT rk,
         round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*),
               6) AS qn_value
  FROM ranked GROUP BY rk
)
SELECT r.metric, r.d, round(r.value, 6) AS orig_value, r.rk,
       f.qn_value
FROM ranked r JOIN ref f USING (rk)
""",
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization — the cross-feature distribution
    equalizer (the genomics/ML preprocessing standard, Bolstad et al.
    2003): each feature's values are replaced by the cross-feature
    MEAN of the order statistics at their rank, so afterwards every
    feature carries the IDENTICAL value distribution while
    preserving each feature's internal ordering. Normalizes the
    three daily lineitem metrics (quantity, revenue, item count —
    wildly different scales) against each other; emits the long-form
    (metric, day, original, rank, normalized) relation.

    Scale shape: exact QN needs a total order PER FEATURE, so the
    honest domain is the calendar-bounded daily rollup (the ts_*
    family's device — ranks run over ~thousands of day rows per
    metric, never over raw lineitem; pdisc-class discipline). At raw
    100 TB row counts production QN swaps the exact ranks for a
    quantile-grid approximation (the feature_quantile_binning
    histogram device applied per feature) — stated, not needed, on
    the bounded rollup. Rank means sum through DECIMAL so the
    reference distribution is bit-equal across engines; rank ties
    break on the day key."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    longf = daily.selectExpr(
        "d",
        "stack(3, 'qty', qty, 'revenue', revenue, 'n_items', n_items) "
        "AS (metric, value)",
    )
    # global-ok per metric: calendar-bounded daily rollup (~2.4k rows
    # per metric at any SF), the ts_* family's bounded-domain device
    wrk = W.partitionBy("metric").orderBy("value", "d")
    ranked = longf.select(
        "d",
        "metric",
        "value",
        F.row_number().over(wrk).cast("long").alias("rk"),
    ).transform(track)  # reference fold + join-back both read it
    ref = ranked.groupBy("rk").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("qn_value")
    )
    return (
        ranked.join(F.broadcast(ref), "rk")  # rank-domain-sized side
        .select(
            "metric",
            "d",
            F.round("value", 6).alias("orig_value"),
            "rk",
            "qn_value",
        )
    )
