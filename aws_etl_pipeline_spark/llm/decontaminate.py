"""Benchmark decontamination for LLM training corpora (SURVEY §2B,
LLM-pipeline tier): drop training documents that share any word
n-gram with a held-out benchmark/eval set.

This is the standard eval-leakage guard (the n-gram-overlap procedure
published with GPT-3/PaLM/Llama data cards) expressed as a Spark
plan that survives 100 TB:

* n-grams are built with ``posexplode`` + ``lead`` windows — pure
  codegen expressions, no interpreted higher-order functions (see
  SCALING.md's measured negative result on HOF unrolling);
* the benchmark n-gram set is tiny by construction (eval suites are
  MBs, corpora are TBs) → ``broadcast`` join, so the 100 TB side is
  never shuffled for candidate generation;
* the contaminated-doc set is a DISTINCT over join hits — bounded by
  corpus size, not n-gram count.

At real scale the join key would be ``xxhash64(ngram)`` (8 bytes vs
the raw string); the oracle-checked twin joins on the raw n-gram so
both engines agree exactly.

Corpus note: the synthetic ``documents.text`` draws from a ~31-word
vocabulary, so 4-grams are the shortest shingle with a non-trivial
cross-doc collision floor — real pipelines use 8–13-gram windows,
same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_spread
from ..registry import query

__all__ = ["decontaminate_ngram"]

#: documents with doc_id % _BENCH_MOD == 0 play the held-out benchmark.
_BENCH_MOD = 37
#: shingle width in words.
_N = 4


@query(
    "decontaminate_ngram",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, g, g + {_N - 1}), ' ') AS ngram
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - {_N - 1})) AS g
        FROM docs)
),
bench AS (
  SELECT DISTINCT ngram FROM grams WHERE doc_id % {_BENCH_MOD} = 0
),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM grams g JOIN bench b USING (ngram)
  WHERE g.doc_id % {_BENCH_MOD} <> 0
)
SELECT d.source,
       count(*)::BIGINT          AS n_train,
       count(c.doc_id)::BIGINT   AS n_contaminated,
       (count(*) - count(c.doc_id))::BIGINT AS n_clean
FROM documents d
LEFT JOIN contaminated c ON d.doc_id = c.doc_id
WHERE d.doc_id % {_BENCH_MOD} <> 0
GROUP BY d.source
""",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination audit: training docs sharing any
    4-word shingle with the benchmark split are flagged; the clean
    counts are what a decontamination filter would keep."""
    d = load_spread(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), " ")).alias("pos", "w"),
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", k).over(win) for k in range(1, _N)]
    grams = tok.select(
        "doc_id", F.concat_ws(" ", *leads).alias("ngram"), leads[-1].alias("_tail")
    ).filter(F.col("_tail").isNotNull())

    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = grams.filter(is_bench).select("ngram").distinct()
    contaminated = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "ngram")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = d.filter(~is_bench).select("doc_id", "source")
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.count("hit").cast("long").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("hit")).cast("long").alias("n_clean"),
        )
    )


#: cosine threshold above which a training vector is considered a
#: semantic leak of a benchmark item (0.35 = this synthetic corpus's
#: same-label similarity floor, the dedup_embedding_cosine setting;
#: real pipelines tune much higher on real embedding geometry).
SEM_DECON_TAU = 0.35

#: benchmark membership: the decontaminate_ngram split, on vectors.
SEM_BENCH_MOD = 37


@query(
    "decontaminate_semantic",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
),
bench AS (SELECT * FROM n WHERE vec_id % {SEM_BENCH_MOD} = 0),
train AS (SELECT * FROM n WHERE vec_id % {SEM_BENCH_MOD} <> 0)
SELECT t.vec_id, t.label,
       max(round(list_dot_product(t.v, b.v) / (t.nrm * b.nrm), 6))
         AS max_benchmark_cos,
       (max(round(list_dot_product(t.v, b.v) / (t.nrm * b.nrm), 6))
        >= {SEM_DECON_TAU}) AS contaminated
FROM train t CROSS JOIN bench b
GROUP BY 1, 2
""",
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) eval-leakage guard — the complement
    to decontaminate_ngram's lexical screen: an eval item paraphrased
    into the training set shares no n-grams but sits next to it in
    embedding space. Every training vector is scored by its maximum
    cosine to ANY benchmark vector; max >= tau flags it.

    Scale shape is the geo_nearest_hub one: benchmark sets are tiny by
    construction (eval suites vs a corpus), so the bench side rides a
    broadcast nested-loop expansion collapsed by a map-side max
    partial agg — shuffle volume is one row per training vector, the
    corpus is scanned once, and nothing ever shuffles by similarity.
    The flag compares the ROUNDED max (both engines take max over
    identically-rounded doubles), so the verdict cannot disagree with
    the reported score. At larger benchmark sets, route candidate
    generation through the LSH bucket join (sim_lsh_ann) and keep
    this exact max as the rescore.
    """
    e = load_spread(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    n = e.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("nrm"),
    )
    bench = n.where(F.col("vec_id") % SEM_BENCH_MOD == 0).select(
        F.col("v").alias("bv"), F.col("nrm").alias("bnrm")
    )
    train = n.where(F.col("vec_id") % SEM_BENCH_MOD != 0)
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("bv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = train.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "label",
        F.round(dot / (F.col("nrm") * F.col("bnrm")), 6).alias("cos"),
    )
    mx = F.max("cos")
    return scored.groupBy("vec_id", "label").agg(
        mx.alias("max_benchmark_cos"),
        (mx >= SEM_DECON_TAU).alias("contaminated"),
    )
