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

__all__ = ["decontaminate_ngram", "decontaminate_fractional"]

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
        train.join(contaminated.hint("shuffle_hash"), "doc_id", "left")  # shuffle_hash pin: corpus-scaled side, never broadcast (r11 sweep)
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


#: OR-amplification geometry: L independent 4-bit hyperplane tables.
#: One 4-bit table with Hamming-1 probes collides a cos=TAU pair with
#: p ~ 0.49 (theory AND the measured 0.50-0.55 recall of the
#: single-table first cut) — fine for top-k ANN, unacceptable for a
#: leak screen where a miss ships eval data. L tables OR-ed lift the
#: threshold-boundary recall to 1-(1-p)^L ~ 0.87 at L=3; stronger
#: leaks (higher cos) collide with higher per-table p and recall
#: approaches 1. The knob is L (cost: L bucket keys per vector).
SEM_LSH_TABLES = 3
_SEM_LSH_BITS = 4


def _sem_lsh_oracle() -> str:
    from .similarity import _ann_bit_sql, plane_weights

    rows = plane_weights(SEM_LSH_TABLES * _SEM_LSH_BITS)

    def bucket_sql(t: int, flip: int | None) -> str:
        tbl = rows[t * _SEM_LSH_BITS : (t + 1) * _SEM_LSH_BITS]
        bits = " || ".join(
            _ann_bit_sql("v", row, invert=(j == flip)) for j, row in enumerate(tbl)
        )
        return f"'{t}:' || {bits}"

    probe_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, v, nrm, {bucket_sql(t, flip)} AS bucket FROM bench"
        for t in range(SEM_LSH_TABLES)
        for flip in [None, *range(_SEM_LSH_BITS)]
    )
    train_buckets = ", ".join(
        f"{bucket_sql(t, None)} AS bucket{t}" for t in range(SEM_LSH_TABLES)
    )
    train_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, label, v, nrm, bucket{t} AS bucket FROM train"
        for t in range(SEM_LSH_TABLES)
    )
    return f"""
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
train0 AS (SELECT * FROM n WHERE vec_id % {SEM_BENCH_MOD} <> 0),
train AS (SELECT *, {train_buckets} FROM train0),
trainb AS (
  {train_union}
),
probes AS (
  {probe_union}
),
cand AS (
  SELECT t.vec_id, t.label,
         round(list_dot_product(t.v, p.v) / (t.nrm * p.nrm), 6) AS cos
  FROM trainb t JOIN probes p ON t.bucket = p.bucket
),
mx AS (SELECT vec_id, label, max(cos) AS m FROM cand GROUP BY 1, 2)
SELECT t.vec_id, t.label, mx.m AS max_candidate_cos,
       coalesce(mx.m >= {SEM_DECON_TAU}, false) AS contaminated
FROM train0 t LEFT JOIN mx USING (vec_id, label)
"""


@query("decontaminate_semantic_lsh", oracle=_sem_lsh_oracle())
def decontaminate_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BIG-BENCHMARK form of decontaminate_semantic — the LSH
    candidate route its docstring promises: when the held-out set is
    too large to ride a broadcast nested-loop (multi-benchmark
    regression suites, continuous eval pools), candidates come from
    L={SEM_LSH_TABLES} INDEPENDENT 4-bit random-hyperplane tables
    (OR-amplification), each probed Hamming-1 on the BENCH side
    (sim_lsh_ann's deterministic-hyperplane machinery, identical on
    both engines), and only collisions are exactly rescored. Per
    training vector: max cosine over its candidates (NULL if no
    collision in any table) and the >= tau flag.

    Why L tables and not sim_lsh_ann's single table: a leak screen is
    recall-critical (a miss ships eval data into training). One 4-bit
    table + Hamming-1 collides a cos=tau pair with p ~ 0.49 — the
    single-table first cut MEASURED 0.50-0.55 recall vs the exact
    screen, matching theory; three OR-ed tables lift the
    threshold-boundary recall to ~1-(1-p)^3 and the measured value to
    ~0.9 (SCALING.md; floor pinned in tests/test_llm.py). The exact
    screen stays the gold standard; L is the recall/cost knob.

    Scale shape: each side emits L bucket keys per vector and shuffles
    ONCE by bucket (the bench side broadcasts while it fits, as
    here); scoring work is |collisions|, not |train| x |bench|. The
    signature stage is persisted and feeds both sides, as a real
    index build would."""
    from .similarity import _ann_bit_spark, _as_double, _dot, _norm, plane_weights
    from ..cache import track

    e = load_spread(spark, sf_dir, "embeddings")
    rows = plane_weights(SEM_LSH_TABLES * _SEM_LSH_BITS)
    nbits = SEM_LSH_TABLES * _SEM_LSH_BITS
    n = (
        e.select("vec_id", "label", _as_double("embedding").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .select(
            "*",
            *[_ann_bit_spark(F.col("v"), r).alias(f"b{k}") for k, r in enumerate(rows)],
        )
        .transform(track)
    )

    def table_bits(t: int) -> list[F.Column]:
        return [F.col(f"b{t * _SEM_LSH_BITS + j}") for j in range(_SEM_LSH_BITS)]

    def flipped(b: F.Column) -> F.Column:
        return F.when(b == "1", "0").otherwise("1")

    def bucket(t: int, flip: int | None) -> F.Column:
        bits = [
            flipped(b) if j == flip else b for j, b in enumerate(table_bits(t))
        ]
        return F.concat(F.lit(f"{t}:"), *bits)

    is_bench = F.col("vec_id") % SEM_BENCH_MOD == 0
    train = n.filter(~is_bench).select(
        "vec_id",
        "label",
        "v",
        "nrm",
        F.explode(
            F.array(*[bucket(t, None) for t in range(SEM_LSH_TABLES)])
        ).alias("bucket"),
    )
    bench = n.filter(is_bench).select(
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
        F.explode(
            F.array(
                *[
                    bucket(t, flip)
                    for t in range(SEM_LSH_TABLES)
                    for flip in [None, *range(_SEM_LSH_BITS)]
                ]
            )
        ).alias("bucket"),
    )
    cand = train.join(F.broadcast(bench), "bucket").select(
        "vec_id",
        "label",
        F.round(
            _dot(F.col("v"), F.col("bv")) / (F.col("nrm") * F.col("bnrm")), 6
        ).alias("cos"),
    )
    mx = cand.groupBy("vec_id", "label").agg(F.max("cos").alias("m"))
    return (
        n.filter(~is_bench)
        .select("vec_id", "label")
        .join(mx.hint("shuffle_hash"), ["vec_id", "label"], "left")  # shuffle_hash pin: corpus-scaled side, never broadcast (r11 sweep)
        .select(
            "vec_id",
            "label",
            F.col("m").alias("max_candidate_cos"),
            F.coalesce(F.col("m") >= SEM_DECON_TAU, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


#: fractional-overlap flag threshold (the PaLM/GPT-3-style data-card
#: rule: a training doc is contaminated when >= this share of its
#: distinct n-grams appears in the eval set; the binary any-gram
#: screen above is the strict/conservative variant).
FRAC_DECON_TAU = 0.7


@query(
    "decontaminate_fractional",
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
overlap AS (
  SELECT g.doc_id,
         count(DISTINCT g.ngram)::BIGINT AS n_grams,
         count(DISTINCT CASE WHEN b.ngram IS NOT NULL
                             THEN g.ngram END)::BIGINT AS n_hit
  FROM grams g LEFT JOIN bench b USING (ngram)
  WHERE g.doc_id % {_BENCH_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT d.source,
       count(*)::BIGINT AS n_train,
       count(*) FILTER (WHERE o.n_hit > 0)::BIGINT AS n_any_overlap,
       count(*) FILTER (WHERE o.n_hit::DOUBLE / o.n_grams
                              >= {FRAC_DECON_TAU})::BIGINT AS n_flagged,
       round(avg(o.n_hit::DOUBLE / o.n_grams), 6) AS avg_overlap_frac
FROM documents d JOIN overlap o ON o.doc_id = d.doc_id
WHERE d.doc_id % {_BENCH_MOD} <> 0
GROUP BY d.source
""",
)
def decontaminate_fractional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-overlap decontamination — the published data-card
    rule (the PaLM / GPT-3 family's "flag a document when a large
    share of its n-grams overlaps the eval set" procedure, here
    >= {FRAC_DECON_TAU:.0%} of DISTINCT {_N}-grams) next to
    `decontaminate_ngram`'s strict any-gram screen: the binary screen
    maximizes recall against verbatim leaks but flags every document
    quoting one common phrase; the fractional rule tolerates
    incidental overlap and flags only documents that are mostly eval
    content. Per-source report: train docs, any-overlap count,
    flagged count, and the mean overlap fraction (the drift signal a
    data steward tracks release over release).

    Plan shape: identical cost model to the strict screen — grams
    explode scan-side, the benchmark set stays a broadcast (eval
    suites are MBs), and the per-doc DISTINCT folds INSIDE the
    overlap aggregate (two countDistincts over the raw gram stream)
    before the source-level rollup; the document text itself never
    shuffles, and nothing gram-sized is ever persisted — the first
    spelling cached a corpus x grams DISTINCT relation and died
    AGGREGATE_OUT_OF_MEMORY at the 1000x replica under its own cache
    pressure."""
    d = load_spread(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), " ")).alias("pos", "w"),
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", k).over(win) for k in range(1, _N)]
    grams = (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *leads).alias("ngram"),
            leads[-1].alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("doc_id", "ngram")
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = grams.filter(is_bench).select("ngram").distinct()
    overlap = (
        grams.filter(~is_bench)
        .join(
            F.broadcast(bench.withColumn("hit", F.lit(1))), "ngram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("ngram")).cast("long").alias("n_grams"),
            F.count_distinct(
                F.when(F.col("hit").isNotNull(), F.col("ngram"))
            )
            .cast("long")
            .alias("n_hit"),
        )
    )
    frac = F.col("n_hit").cast("double") / F.col("n_grams")
    train = d.filter(~is_bench).select("doc_id", "source")
    return (
        train.join(overlap.hint("shuffle_hash"), "doc_id")  # shuffle_hash pin: corpus-scaled side, never broadcast (r11 sweep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.count_if(F.col("n_hit") > 0).cast("long").alias("n_any_overlap"),
            F.count_if(frac >= FRAC_DECON_TAU).cast("long").alias("n_flagged"),
            F.round(F.avg(frac), 6).alias("avg_overlap_frac"),
        )
    )
