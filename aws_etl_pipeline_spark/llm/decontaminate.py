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
