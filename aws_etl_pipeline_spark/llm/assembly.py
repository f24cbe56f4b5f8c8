"""Training-data assembly (north star, SURVEY §2B): the operations
that turn a cleaned document corpus into model-ready training batches —
token-budget packing, stratified class sampling, source/domain mixing,
and context-window chunking.

All four are pure Catalyst expressions (deterministic md5-derived
hashes, window cumsums, sequence/explode) so they run inside
whole-stage codegen next to the scan and are DuckDB-oracle-verifiable.
At 100 TB each is one shuffle or none:

  * packing     — one global order + running-sum window (in practice
                  partitioned per shard; here one partition is the
                  sf-sized shard);
  * sampling    — a scan-side filter, no shuffle at all;
  * mixing      — explode by a per-source weight, no shuffle;
  * chunking    — explode of slice starts, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load_spread, load_table
from ..registry import query

#: context window (tokens) for packing/chunking demos — small so the
#: sf0.01 corpus produces many bins/chunks worth checking.
BUDGET = 2048
CHUNK = 32
STRIDE = 24


def _tokens(col: str = "text") -> F.Column:
    return F.size(F.split(F.lower(F.trim(F.col(col))), " "))


def _md5_bucket(col: F.Column, mod: int) -> F.Column:
    """Deterministic [0, mod) bucket both engines compute identically:
    first 8 md5 hex chars as an integer."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % mod


@query(
    "pack_token_budget",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(lower(trim(text)), ' ')) AS tokens,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 1000000 AS shuf
  FROM documents
),
placed AS (
  SELECT doc_id, tokens,
         sum(tokens) OVER (ORDER BY shuf, doc_id
                           ROWS UNBOUNDED PRECEDING) - tokens AS start_off
  FROM t
)
SELECT (start_off // {BUDGET})::BIGINT AS bin,
       count(*)::BIGINT AS n_docs,
       sum(tokens)::BIGINT AS tokens
FROM placed GROUP BY 1
""",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: documents are laid end-to-end in a
    deterministic shuffled order and assigned to {BUDGET}-token context
    bins by their starting offset (concatenate-then-chunk packing, the
    standard LM pretraining layout). Returns per-bin fill stats.

    The global running sum is NOT a single-partition window: the
    deterministic shuffle key sub-buckets the corpus into 64
    uniform ranges, each sub-bucket cumsums
    locally in parallel, and a broadcast prefix-sum over the tiny
    per-sub-bucket totals stitches them into exact global offsets —
    the two-pass discipline shared with etl_dense_surrogate_ids /
    pack_curriculum_order / pack_bestfit_windows. Value-identical to
    the textbook ORDER BY window (the oracle's spelling)."""
    d = load_table(spark, sf_dir, "documents")
    sb_width = 1_000_000 // 64
    t = d.select(
        "doc_id",
        _tokens().alias("tokens"),
        _md5_bucket(F.col("doc_id"), 1_000_000).alias("shuf"),
    ).withColumn(
        # equal shuf => equal sub-bucket: boundaries never split the
        # (shuf, doc_id) order
        "sb", F.floor(F.col("shuf") / sb_width).cast("long")
    ).transform(track)  # totals pass + local-cumsum pass
    totals = t.groupBy("sb").agg(F.sum("tokens").alias("tok"))
    offsets = totals.select(
        "sb",
        F.coalesce(
            F.sum("tok").over(
                # global-ok: sub-bucket totals relation (~64 rows)
                W.orderBy("sb").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    local = W.partitionBy("sb").orderBy("shuf", "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    placed = t.join(F.broadcast(offsets), "sb").withColumn(
        "start_off",
        F.col("offset") + F.sum("tokens").over(local) - F.col("tokens"),
    )
    return (
        placed.groupBy(
            F.floor(F.col("start_off") / BUDGET).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("tokens"),
        )
    )


#: per-language keep-rate (percent) for the stratified sampler: cap the
#: majority classes, keep the tails whole.
STRATA_PCT = {"en": 20, "es": 40, "de": 60, "fr": 80, "zh": 100}
DEFAULT_PCT = 50


@query(
    "sample_stratified",
    oracle="""
WITH kept AS (
  SELECT lang
  FROM documents
  WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100
        < CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 40 WHEN 'de' THEN 60
                    WHEN 'fr' THEN 80 WHEN 'zh' THEN 100 ELSE 50 END
)
SELECT d.lang, count(*)::BIGINT AS total,
       (SELECT count(*) FROM kept k WHERE k.lang = d.lang)::BIGINT AS kept
FROM documents d GROUP BY d.lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: a per-class keep-rate applied through a
    deterministic doc-id hash — rebalances language skew without an RNG,
    so the sample is reproducible row-for-row on any cluster layout.
    Returns per-language total vs kept counts.

    The filter is scan-side (no shuffle, no sampling pass): at 100 TB
    the predicate rides the parquet scan and the sample never
    materializes."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in STRATA_PCT.items()],
        F.lit(DEFAULT_PCT),
    )
    keep = _md5_bucket(F.col("doc_id"), 100) < pct
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("kept"),
    )


@query(
    "mix_sources",
    oracle="""
WITH w AS (
  SELECT doc_id, source,
         len(string_split(lower(trim(text)), ' ')) AS tokens,
         1 + ('0x' || substring(md5(source), 1, 8))::UBIGINT % 3 AS weight
  FROM documents
),
rep AS (
  SELECT source, tokens, unnest(generate_series(1, weight::BIGINT)) AS epoch
  FROM w
)
SELECT source, count(*)::BIGINT AS samples, sum(tokens)::BIGINT AS tokens
FROM rep GROUP BY source
""",
)
def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: each source gets a deterministic epoch weight
    (1-3, hash-derived here; a mixing config in practice) and its
    documents are replicated that many times — the up-sampling step of
    a pretraining data mixture. Returns per-source sample/token counts.

    explode(sequence(1, w)) replicates rows inside the scan stage; no
    shuffle until the final small aggregate."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "source",
        _tokens().alias("tokens"),
        (1 + _md5_bucket(F.col("source"), 3)).alias("weight"),
    )
    rep = w.select(
        "source", "tokens", F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("epoch")
    )
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("samples"),
        F.sum("tokens").cast("long").alias("tokens"),
    )


@query(
    "chunk_context_windows",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
  FROM documents
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, {STRIDE})) AS start
  FROM t
)
SELECT doc_id, (start / {STRIDE})::BIGINT AS chunk_idx,
       least({CHUNK}, len(ws) - start)::BIGINT AS n_tokens,
       ws[start + 1] AS head_token
FROM starts
""",
)
def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document splits into {CHUNK}-token
    windows every {STRIDE} tokens ({CHUNK - STRIDE}-token overlap) —
    the sliding-window tokenization layout for long-document training.
    Returns one row per chunk with its length and first token.

    The slice starts explode from a sequence inside the scan stage;
    nothing shuffles. At 100 TB this is the map-side of the packing
    job."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), " ")
    t = d.select("doc_id", ws.alias("ws"))
    starts = t.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), F.size("ws") - 1, F.lit(STRIDE))).alias("start"),
    )
    return starts.select(
        "doc_id",
        (F.col("start") / STRIDE).cast("long").alias("chunk_idx"),
        F.least(F.lit(CHUNK), F.size("ws") - F.col("start")).cast("long").alias("n_tokens"),
        F.element_at("ws", F.col("start") + 1).alias("head_token"),
    )


@query(
    "mix_temperature",
    oracle="""
WITH s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(string_split(lower(trim(text)), ' ')))::BIGINT AS n_tokens
  FROM documents GROUP BY 1
),
t AS (
  SELECT source, n_docs, n_tokens,
         n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS p_raw,
         sum(n_docs) OVER () AS total
  FROM s
),
w AS (
  SELECT *, sqrt(p_raw) AS wgt,
         CAST(sum(CAST(sqrt(p_raw) AS DECIMAL(30, 18))) OVER () AS DOUBLE)
           AS wgt_sum
  FROM t
)
SELECT source, n_docs, n_tokens,
       round(p_raw, 6) AS p_raw,
       round(wgt / wgt_sum, 6) AS p_temp,
       CAST(round(wgt / wgt_sum * total, 0) AS BIGINT) AS expected_docs
FROM w
""",
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LM sampling
    scheme of mBERT/XLM-R/mT5: q_i = p_i^alpha / sum p_j^alpha with
    alpha = 0.5): flattens the raw source distribution so low-resource
    sources are up-sampled without letting any source dominate.
    Returns, per source, the raw share, the temperature share, and the
    expected document count an epoch at the mixed rate would draw.

    One tiny aggregation: per-source counts (a broadcast-sized
    relation at any corpus size — cardinality is the number of
    SOURCES), then two window scalars over that relation. sqrt (not
    pow(x, 0.5)) on both engines — Math.sqrt and C sqrt are both
    IEEE correctly-rounded so the doubles match bit-for-bit; the
    weight sum goes through DECIMAL so summation order cannot move
    the last ulp."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(_tokens()).cast("long").alias("n_tokens"),
    )
    tot = W.partitionBy()
    t = s.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_docs") / F.sum("n_docs").over(tot).cast("double")).alias(
            "p_raw"
        ),
        F.sum("n_docs").over(tot).alias("total"),
    )
    w = t.select(
        "*",
        F.sqrt("p_raw").alias("wgt"),
        F.sum(F.sqrt("p_raw").cast("decimal(30,18)"))
        .over(tot)
        .cast("double")
        .alias("wgt_sum"),
    )
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("p_raw", 6).alias("p_raw"),
        F.round(F.col("wgt") / F.col("wgt_sum"), 6).alias("p_temp"),
        F.round(F.col("wgt") / F.col("wgt_sum") * F.col("total"), 0)
        .cast("long")
        .alias("expected_docs"),
    )


N_SHARDS = 16  # output shards for the manifest demo
PER_SOURCE_N = 10  # balanced-sample size per source


@query(
    "shard_manifest",
    oracle=f"""
SELECT (('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % {N_SHARDS})::BIGINT
         AS shard,
       count(*)::BIGINT AS n_docs,
       sum(len(string_split(lower(trim(text)), ' ')))::BIGINT AS n_tokens,
       count(DISTINCT source)::BIGINT AS n_sources,
       min(doc_id)::BIGINT AS min_doc_id,
       max(doc_id)::BIGINT AS max_doc_id
FROM documents GROUP BY 1
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: every document lands in one of
    {N_SHARDS} shards by a stable content-independent hash of its id,
    and the manifest row per shard carries the counts a dataloader
    needs (docs, tokens, source spread, id range) and a resume/audit
    needs (did shard 7 really get written whole?).

    At 100 TB this is THE fan-out step before the sharded write: the
    same hash feeds ``df.repartition(N, shard).write`` so each shard
    is one writer task's output, and this manifest aggregation is a
    single shuffle of {N_SHARDS} x partitions tiny partial rows — the
    documents themselves never move for the manifest."""
    d = load_table(spark, sf_dir, "documents")
    shard = _md5_bucket(F.col("doc_id"), N_SHARDS).alias("shard")
    return (
        d.select(
            shard,
            _tokens().alias("tokens"),
            "doc_id",
            "source",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("n_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "sample_balanced_sources",
    oracle=f"""
SELECT source, doc_id,
       len(string_split(lower(trim(text)), ' '))::BIGINT AS tokens
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT, doc_id
) <= {PER_SOURCE_N}
""",
)
def sample_balanced_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source balanced sample: the {PER_SOURCE_N} documents with
    the smallest stable hash per source — a deterministic reservoir
    that gives every source equal representation regardless of its
    raw volume (the eval-slice / ablation-set builder; df.sample can't
    do per-group exact-N and isn't reproducible across partitionings).

    One window shuffle keyed by source; per-group state is a running
    top-N. A 100 TB corpus with a skewed source distribution keeps
    the same shape — the rank is over the hash, so no source's data
    volume changes what any other source contributes."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(_md5_bucket(F.col("doc_id"), 1 << 32), "doc_id")
    return (
        d.select("source", "doc_id", _tokens().cast("long").alias("tokens"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PER_SOURCE_N)
        .drop("rn")
    )


RESERVOIR_K = 50  # global weighted-sample size


@query(
    "sample_weighted_reservoir",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         round(ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT + 0.5)
                  / 4294967296.0) / n_chars, 12) AS es_key
  FROM documents
)
SELECT doc_id, source, n_chars, es_key
FROM keyed
QUALIFY row_number() OVER (ORDER BY es_key DESC, doc_id) <= {RESERVOIR_K}
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (Efraimidis-Spirakis A-ES): each doc
    gets key ln(u)/w with u a deterministic (0,1) hash and w its
    length; the global top-{RESERVOIR_K} by key IS an exact weighted
    sample without replacement — longer documents proportionally more
    likely, reproducible on any cluster layout because u is a stable
    hash, not an RNG draw.

    The 100 TB shape is the whole point: a distributed weighted sample
    reduces to a global top-k, which Spark executes as
    TakeOrderedAndProject (per-partition heap + driver merge of
    {RESERVOIR_K} rows) — no shuffle, no sort of the corpus, state is
    k rows per partition. The ES key is rounded to 12 decimals on both
    engines so a last-ulp libm difference in ln() can never flip the
    selection boundary (doc_id breaks exact ties); the residual
    fragility is HALF_UP-on-DOUBLE agreement between engines at the
    rounding step itself — should a last-ulp tie on other data ever
    flip the boundary, route ln/divide through DECIMAL before rounding
    on both sides, as embed_pca_project's note prescribes."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    es_key = F.round(F.log(u) / F.col("n_chars"), 12)
    return (
        d.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(RESERVOIR_K)
    )


DSIR_BUCKETS = 64  # hashed-unigram feature buckets
DSIR_K = 50  # resampled set size
DSIR_TARGET_LANG = "en"  # the "target domain" the importance weights aim at


@query(
    "sample_importance_resampling",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(u.term), 1, 8))::UBIGINT::BIGINT % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents) d,
       LATERAL (SELECT unnest(ws) AS term) u
),
raw AS (SELECT b, count(*)::DOUBLE AS cr FROM w GROUP BY b),
tgt AS (SELECT b, count(*)::DOUBLE AS ct FROM w
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT sum(cr) FROM raw)               AS nr,
               (SELECT coalesce(sum(ct), 0) FROM tgt)  AS nt),
lr AS (
  SELECT r.b,
         round(ln((coalesce(t.ct, 0) + 1) / (tot.nt + {DSIR_BUCKETS}))
               - ln((r.cr + 1) / (tot.nr + {DSIR_BUCKETS})), 12) AS lr
  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tot
),
scored AS (
  SELECT w.doc_id,
         round(CAST(sum(CAST(lr.lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS log_w
  FROM w JOIN lr USING (b) GROUP BY w.doc_id
)
SELECT s.doc_id, d2.lang, d2.source, s.log_w,
       round(s.log_w
             - ln(-ln((('0x' || substr(md5(s.doc_id::VARCHAR), 1, 8))::UBIGINT
                       + 0.5) / 4294967296.0)), 6) AS sel_key
FROM scored s JOIN documents d2 USING (doc_id)
QUALIFY row_number() OVER (ORDER BY sel_key DESC, doc_id) <= {DSIR_K}
""",
)
def sample_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv 2302.03169):
    estimate per-document importance weights log w(x) = log
    p_target(x) - log p_raw(x) under two hashed-unigram bag-of-words
    models ({DSIR_BUCKETS} md5 buckets, add-1 smoothing; target = the
    '{DSIR_TARGET_LANG}'-language slice standing in for the
    high-quality domain), then resample the top-{DSIR_K} by Gumbel
    perturbation (key = log_w - ln(-ln u), u a deterministic md5 hash
    — the Gumbel-top-k trick IS sampling-without-replacement
    proportional to w).

    100 TB shape: the two feature models are {DSIR_BUCKETS}-row
    relations (one word shuffle into bucket counts, broadcast back),
    the per-doc score is one doc-keyed sum of per-word log-ratios
    (map-side combined; summed through DECIMAL so the result is
    order-independent and bit-equal to the oracle), and the selection
    is a global top-k = TakeOrderedAndProject — per-partition heaps,
    no corpus sort or shuffle. Everything md5-derived and replayed
    exactly by the DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("term"),
    )
    wb = words.select(
        "doc_id", "lang", _md5_bucket(F.col("term"), DSIR_BUCKETS).alias("b")
    )
    raw = wb.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cr"))
    tgt = (
        wb.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    tot = raw.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0.0)).alias("nt"))
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0.0)) + 1)
                    / (F.col("nt") + DSIR_BUCKETS)
                )
                - F.log((F.col("cr") + 1) / (F.col("nr") + DSIR_BUCKETS)),
                12,
            ).alias("lr"),
        )
    )
    scored = (
        wb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("lr").cast("decimal(28,12)")).cast("double"), 6
            ).alias("log_w")
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    sel_key = F.round(F.col("log_w") - F.log(-F.log(u)), 6)
    return (
        scored.join(d.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "log_w", sel_key.alias("sel_key"))
        .orderBy(F.desc("sel_key"), F.asc("doc_id"))
        .limit(DSIR_K)
    )


@query(
    "pack_interleave_domains",
    oracle="""
WITH srcs AS (
  SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx,
         count(*) OVER () AS n_srcs
  FROM (SELECT DISTINCT source FROM documents)
),
ranked AS (
  SELECT d.doc_id, d.source, s.src_idx, s.n_srcs,
         row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) - 1
           AS rank_in_src
  FROM documents d JOIN srcs s ON s.source = d.source
)
SELECT (rank_in_src * n_srcs + src_idx)::BIGINT AS position,
       source, doc_id,
       (rank_in_src * n_srcs + src_idx) % n_srcs = src_idx AS stride_ok
FROM ranked
""",
)
def pack_interleave_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain interleaving for training order: documents
    are striped round-robin across sources (position = rank-in-source
    × n_sources + source-index), so any contiguous training window
    sees every domain at its global mixture rate — the anti-
    correlation shuffle LLM data loaders want, computed as a pure
    expression instead of an RNG permutation (same reproducibility
    argument as `sample_stable_hash`). The per-source rank windows
    partition by source; the tiny source table is a broadcast join.
    Unequal source sizes tail off exactly as the stride formula
    dictates (positions stay unique because stride ≡ src_idx mod
    n_srcs, pinned by the stride_ok verdict column)."""
    d = load_table(spark, sf_dir, "documents")
    srcs = (
        d.select("source")
        .distinct()
        .select(
            "source",
            # global-ok: distinct-source relation (a handful of rows)
            (F.row_number().over(W.orderBy("source")) - 1).alias("src_idx"),
        )
    )
    n_srcs = srcs.agg(F.count(F.lit(1)).alias("n_srcs"))
    ranked = (
        d.join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n_srcs))
        .withColumn(
            "rank_in_src",
            F.row_number().over(W.partitionBy("source").orderBy("doc_id")) - 1,
        )
    )
    pos = F.col("rank_in_src") * F.col("n_srcs") + F.col("src_idx")
    return ranked.select(
        pos.cast("long").alias("position"),
        "source",
        "doc_id",
        (pos % F.col("n_srcs") == F.col("src_idx")).alias("stride_ok"),
    )


#: split boundaries on the 0..99 salted-hash bucket: [0,80) train,
#: [80,90) val, [90,100) test.
SPLIT_EDGES = (80, 90)


@query(
    "sample_train_test_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5('split42:' || doc_id), 1, 8))::UBIGINT % 100 AS bucket
  FROM documents
),
lab AS (
  SELECT CASE WHEN bucket < {SPLIT_EDGES[0]} THEN 'train'
              WHEN bucket < {SPLIT_EDGES[1]} THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM b
),
tot AS (SELECT count(*)::BIGINT AS n_total FROM documents)
SELECT split, count(*)::BIGINT AS n_docs,
       round(count(*)::DOUBLE / t.n_total, 6) AS pct_of_corpus,
       sum(n_chars)::BIGINT AS n_chars,
       (sum(count(*)) OVER () = t.n_total) AS covers_corpus
FROM lab CROSS JOIN tot t
GROUP BY split, t.n_total
""",
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by salted-md5
    bucket of the document key — the split every training pipeline
    freezes before anything else, with the properties that matter
    hash-pinned: membership is a pure function of (salt, doc_id), so
    the split is identical across runs, engines, partitionings, and
    corpus growth (an old doc never migrates between splits when new
    docs arrive — the failure mode of ntile/percent_rank splits), and
    the emitted ``covers_corpus`` verdict proves the three buckets
    partition the corpus exactly (no loss, no leakage-by-duplication).

    One scan, one 3-row aggregate; the hash is JVM-side md5 on both
    engines (the stable_sample device). Per-split char mass ships in
    the same pass so downstream token budgeting needs no rescan.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split42:"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    lab = d.select(
        F.when(bucket < SPLIT_EDGES[0], "train")
        .when(bucket < SPLIT_EDGES[1], "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    agg = (
        lab.crossJoin(F.broadcast(tot))
        .groupBy("split", "n_total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    return agg.select(
        "split",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n_total"), 6).alias(
            "pct_of_corpus"
        ),
        "n_chars",
        (
            F.sum("n_docs").over(W.partitionBy()) == F.col("n_total")
        ).alias("covers_corpus"),
    )


#: Neyman allocation: total sample budget across strata.
NEYMAN_TOTAL = 500


@query(
    "sample_neyman_allocation",
    oracle=f"""
WITH s AS (
  SELECT c_mktsegment AS stratum,
         count(*)::BIGINT AS nh,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sx,
         sum(CAST(c_acctbal AS DECIMAL(18,2))
             * CAST(c_acctbal AS DECIMAL(18,2))) AS sxx
  FROM customer GROUP BY 1
),
sd AS (
  SELECT stratum, nh,
         sqrt((CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / nh)
              / (nh - 1)) AS sh
  FROM s
),
tot AS (
  SELECT CAST(sum(CAST(nh * sh AS DECIMAL(30,6))) AS DOUBLE) AS denom
  FROM sd
),
alloc AS (
  SELECT stratum, nh, sh,
         CAST(floor({NEYMAN_TOTAL} * (nh * sh) / denom) AS BIGINT) AS n_alloc
  FROM sd, tot
),
ranked AS (
  SELECT c_mktsegment AS stratum,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(CAST(c_custkey AS VARCHAR)),
                                     c_custkey) AS rnk
  FROM customer
),
achieved AS (
  SELECT r.stratum, count(*)::BIGINT AS n_achieved
  FROM ranked r JOIN alloc a USING (stratum)
  WHERE r.rnk <= a.n_alloc
  GROUP BY 1
)
SELECT a.stratum, a.nh, round(a.sh, 6) AS sh, a.n_alloc,
       ach.n_achieved,
       round(CAST(a.nh AS DOUBLE) / a.n_alloc, 6) AS est_weight
FROM alloc a JOIN achieved ach USING (stratum)
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling design: the {NEYMAN_TOTAL}-row
    budget is allocated across market segments proportional to
    N_h * S_h (stratum size x stratum stddev) — the allocation that
    minimizes estimator variance for a fixed budget, i.e. the
    statistically principled upgrade over `sample_stratified`'s
    equal-rate design (high-variance strata earn more rows). The
    achieved sample is the deterministic per-stratum top-n_alloc in
    md5(custkey) hash order (`sample_stable_hash`'s device), so the
    draw is reproducible and oracle-checkable; est_weight = N_h /
    n_alloc is the Horvitz-Thompson expansion weight downstream
    estimators multiply by.

    Scale shape: stratum stddevs come from ONE map-side-combined pass
    of exact DECIMAL sufficient statistics (count/sum/sum-of-squares);
    the N_h*S_h normalizer is a broadcast scalar; the draw is a
    per-stratum rank window (partitioned by stratum — parallel across
    strata; for mega-strata swap in the two-pass bucket-offset rank,
    the etl_dense_surrogate_ids device). sqrt/division run on
    identical doubles from exact sums; allocations use floor so both
    engines agree at .5 boundaries."""
    cust = load_table(spark, sf_dir, "customer")
    v = F.col("c_acctbal").cast("decimal(18,2)")
    s = cust.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum(v).alias("sx"),
        F.sum(v * v).alias("sxx"),
    )
    sxd = F.col("sx").cast("double")
    sd = s.select(
        "stratum",
        "nh",
        F.sqrt(
            (F.col("sxx").cast("double") - sxd * sxd / F.col("nh"))
            / (F.col("nh") - 1)
        ).alias("sh"),
    )
    sd = sd.transform(track)
    tot = sd.agg(
        F.sum((F.col("nh") * F.col("sh")).cast("decimal(30,6)"))
        .cast("double")
        .alias("denom")
    )
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "nh",
        "sh",
        F.floor(NEYMAN_TOTAL * (F.col("nh") * F.col("sh")) / F.col("denom"))
        .cast("long")
        .alias("n_alloc"),
    )
    ranked = cust.select(
        F.col("c_mktsegment").alias("stratum"),
        F.row_number()
        .over(
            W.partitionBy("c_mktsegment").orderBy(
                F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
            )
        )
        .alias("rnk"),
    )
    achieved = (
        ranked.join(F.broadcast(alloc.select("stratum", "n_alloc")), "stratum")
        .filter(F.col("rnk") <= F.col("n_alloc"))
        .groupBy("stratum")
        .agg(F.count(F.lit(1)).cast("long").alias("n_achieved"))
    )
    return alloc.join(achieved, "stratum").select(
        "stratum",
        "nh",
        F.round("sh", 6).alias("sh"),
        "n_alloc",
        "n_achieved",
        F.round(F.col("nh").cast("double") / F.col("n_alloc"), 6).alias(
            "est_weight"
        ),
    )


CURRICULUM_STAGES = 4
LONG_WORD_LEN = 7  # words longer than this count toward difficulty
#: within-stage sub-bucket width = 1/SCALE difficulty units; keeps the
#: (stage, dbucket) count relation tiny (~stages * difficulty_range *
#: SCALE rows) while bounding each local sort to one bucket.
CURRICULUM_BUCKET_SCALE = 1000


def _curriculum_oracle() -> str:
    qs = ", ".join(
        # pdisc-ok: DuckDB oracle twin (single-node check SQL, not a
        # Spark plan); the Spark-side bound is stated at the F.expr site
        f"percentile_disc({k / CURRICULUM_STAGES}) WITHIN GROUP (ORDER BY difficulty) AS q{k}"
        for k in range(1, CURRICULUM_STAGES)
    )
    stage = "CASE "
    for k in range(1, CURRICULUM_STAGES):
        stage += f"WHEN difficulty <= q{k} THEN {k} "
    stage += f"ELSE {CURRICULUM_STAGES} END"
    return f"""
WITH scored AS (
  SELECT doc_id,
         round(
           list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
           + 2.0 * len(list_filter(ws, w -> length(w) > {LONG_WORD_LEN}))::DOUBLE
                 / len(ws),
           6) AS difficulty
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
),
bounds AS (SELECT {qs} FROM scored),
staged AS (
  SELECT doc_id, difficulty, ({stage})::BIGINT AS stage
  FROM scored CROSS JOIN bounds
)
SELECT doc_id, difficulty, stage,
       row_number() OVER (PARTITION BY stage
                          ORDER BY difficulty, doc_id)::BIGINT AS stage_pos
FROM staged
"""


@query("pack_curriculum_order", oracle=_curriculum_oracle())
def pack_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning corpus ordering (Bengio et al. 2009): score
    each document's difficulty (mean word length + 2x long-word share —
    the cheap proxy curricula actually start from), split the corpus
    into ``CURRICULUM_STAGES`` (= 4) difficulty stages at exact quartile
    boundaries, and assign a deterministic within-stage position. A
    training loader then consumes stage 1 before stage 2, etc. —
    the assembly-side ordering primitive next to `mix_temperature`
    (what to sample) and `pack_interleave_domains` (how to stripe).

    Stage boundaries are PERCENTILE_DISC — real data values, no
    interpolation doubles — folded to ONE broadcast row, so staging is
    a scan-fused comparison, never a global sort (the
    feature_quantile_binning discipline).

    Within-stage positions do NOT use a per-stage window — with only
    4 stages that would bound parallelism at
    4 tasks, each sorting ~1/4 of
    the corpus (measured 22x wall at 100x data). Instead this is the
    two-pass range-bucket + broadcast prefix-sum form
    (etl_dense_surrogate_ids discipline, operators/etl.py): sub-bucket
    each stage by difficulty range, count per (stage, bucket) — a
    bucket-count-sized aggregate — prefix-sum the counts into
    per-bucket offsets with a window over the TINY bucket relation,
    broadcast the offsets back, and emit offset + local row_number
    within (stage, bucket). Every data-sized stage is parallel; the
    only per-row window partitions by (stage, bucket). Value-identical
    to the per-stage window because bucket boundaries respect the
    (difficulty, doc_id) order — which is exactly what the unchanged
    oracle checks. Plan-asserted: no Window partitioned by stage alone
    (tests/test_plans.py)."""
    d = load_spread(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), " ")
    wlen = F.transform(ws, lambda w: F.length(w))
    scored = d.select(
        "doc_id",
        F.round(
            F.aggregate(wlen, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")).cast("double")
            / F.size(ws)
            + F.lit(2.0)
            * F.size(F.filter(ws, lambda w: F.length(w) > LONG_WORD_LEN))
            / F.size(ws),
            6,
        ).alias("difficulty"),
    ).transform(track)  # bounds fold + staging pass
    # pdisc-ok: percentile buffers one counter per DISTINCT value;
    # difficulty is a 6-dp ratio in [1, ~LONG_WORD_LEN*3] (mean word
    # length + 2x long-word share), so the buffer is value-domain-
    # bounded (~<=5e7 counters worst case, independent of corpus size)
    bounds = scored.agg(
        *[
            F.expr(
                f"percentile_disc({k / CURRICULUM_STAGES}) "
                "WITHIN GROUP (ORDER BY difficulty)"
            ).alias(f"q{k}")
            for k in range(1, CURRICULUM_STAGES)
        ]
    )
    stage = F.lit(CURRICULUM_STAGES)
    for k in range(CURRICULUM_STAGES - 1, 0, -1):
        stage = F.when(
            F.col("difficulty") <= F.col(f"q{k}"), F.lit(k)
        ).otherwise(stage)
    staged = scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "difficulty", stage.cast("long").alias("stage")
    )
    # Two-pass dense position: difficulty is already rounded to 6
    # decimals, and the sub-bucket is a monotone function of
    # difficulty, so a bucket boundary can never split a difficulty
    # tie — (stage, dbucket, difficulty, doc_id) order equals
    # (stage, difficulty, doc_id) order.
    b = staged.withColumn(
        "dbucket",
        F.floor(F.col("difficulty") * CURRICULUM_BUCKET_SCALE).cast("long"),
    )
    counts = b.groupBy("stage", "dbucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    offsets = counts.select(
        "stage",
        "dbucket",
        F.coalesce(
            F.sum("cnt").over(
                W.partitionBy("stage")
                .orderBy("dbucket")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    local = F.row_number().over(
        W.partitionBy("stage", "dbucket").orderBy("difficulty", "doc_id")
    )
    return b.join(F.broadcast(offsets), ["stage", "dbucket"]).select(
        "doc_id",
        "difficulty",
        "stage",
        (F.col("offset") + local).cast("long").alias("stage_pos"),
    )


BUDGET_FRAC = 0.4  # epoch token budget as a share of corpus tokens
BUDGET_ALPHA = 0.5  # temperature for the per-source allocation


def _mix_budget_oracle() -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, source,
         len(string_split(lower(trim(text)), ' '))::BIGINT AS tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 1000000
           AS shuf
  FROM documents
),
src AS (
  SELECT source, sum(tokens)::DOUBLE AS src_tokens FROM docs GROUP BY source
),
tot AS (
  SELECT CAST(sum(CAST(sqrt(src_tokens) AS DECIMAL(38,18))) AS DOUBLE) AS wsum,
         sum(src_tokens) AS total_tokens
  FROM src
),
alloc AS (
  SELECT source,
         floor({BUDGET_FRAC} * total_tokens * sqrt(src_tokens) / wsum)::BIGINT
           AS alloc_tokens
  FROM src CROSS JOIN tot
),
ordered AS (
  SELECT d.doc_id, d.source, d.tokens, a.alloc_tokens,
         coalesce(sum(d.tokens) OVER (
           PARTITION BY d.source ORDER BY d.shuf, d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM docs d JOIN alloc a USING (source)
)
SELECT source, max(alloc_tokens)::BIGINT AS alloc_tokens,
       count(*) FILTER (WHERE cum_before < alloc_tokens)::BIGINT AS n_docs,
       coalesce(sum(tokens) FILTER (WHERE cum_before < alloc_tokens), 0)::BIGINT
         AS tokens_taken,
       round(coalesce(sum(tokens) FILTER (WHERE cum_before < alloc_tokens), 0)
             ::DOUBLE / max(alloc_tokens), 6) AS fill_ratio
FROM ordered GROUP BY source
"""


@query("mix_token_budget", oracle=_mix_budget_oracle())
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch assembly under a global token budget: the corpus-wide
    budget ({BUDGET_FRAC:.0%} of corpus tokens) is allocated across
    sources by temperature weights (alpha={BUDGET_ALPHA}, the
    `mix_temperature` scheme), then each source admits documents in
    the deterministic md5-shuffled order until its allocation is spent
    (a document is admitted while the tokens BEFORE it are inside the
    budget, so the boundary doc is included — the conventional
    greedy-fill rule). Reports per-source allocation, docs and tokens
    admitted, and fill ratio. This is the operator that turns
    `mix_temperature`'s TARGET distribution into an actual epoch
    manifest — the step between policy and shards.

    Plan: source stats are a sources-sized broadcast; admission is ONE
    per-source cumulative-sum window over the md5 order (at 100 TB the
    order key doubles as the shard key — the pack_token_budget note —
    so each shard fills independently); the report is one aggregate.
    sqrt weights and DECIMAL weight sums keep both engines
    bit-identical."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "source",
        _tokens().cast("long").alias("tokens"),
        _md5_bucket(F.col("doc_id"), 1_000_000).alias("shuf"),
    ).transform(track)  # src stats + ordered admission both read it
    src = docs.groupBy("source").agg(
        F.sum("tokens").cast("double").alias("src_tokens")
    )
    tot = src.agg(
        F.sum(F.sqrt("src_tokens").cast("decimal(38,18)"))
        .cast("double")
        .alias("wsum"),
        F.sum("src_tokens").alias("total_tokens"),
    )
    alloc = src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.lit(BUDGET_FRAC)
            * F.col("total_tokens")
            * F.sqrt("src_tokens")
            / F.col("wsum")
        )
        .cast("long")
        .alias("alloc_tokens"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("shuf", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = docs.join(F.broadcast(alloc), "source").select(
        "source",
        "tokens",
        "alloc_tokens",
        F.coalesce(F.sum("tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    admitted = F.col("cum_before") < F.col("alloc_tokens")
    return ordered.groupBy("source").agg(
        F.max("alloc_tokens").cast("long").alias("alloc_tokens"),
        F.sum(admitted.cast("int")).cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(admitted, F.col("tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("tokens_taken"),
        F.round(
            F.coalesce(F.sum(F.when(admitted, F.col("tokens"))), F.lit(0))
            .cast("double")
            / F.max("alloc_tokens"),
            6,
        ).alias("fill_ratio"),
    )


LEN_BUCKETS = 10  # decile length buckets


def _lenbucket_oracle() -> str:
    qs = ", ".join(
        # pdisc-ok: DuckDB oracle twin (single-node check SQL, not a
        # Spark plan); the Spark-side bound is stated at the F.expr site
        f"percentile_disc({k / LEN_BUCKETS}) WITHIN GROUP (ORDER BY tokens) AS q{k}"
        for k in range(1, LEN_BUCKETS)
    )
    bucket = "CASE "
    for k in range(1, LEN_BUCKETS):
        bucket += f"WHEN tokens <= q{k} THEN {k} "
    bucket += f"ELSE {LEN_BUCKETS} END"
    return f"""
WITH docs AS (
  SELECT doc_id,
         len(string_split(lower(trim(text)), ' '))::BIGINT AS tokens
  FROM documents
),
bounds AS (SELECT {qs} FROM docs),
bucketed AS (
  SELECT doc_id, tokens, ({bucket})::BIGINT AS bucket
  FROM docs CROSS JOIN bounds
)
SELECT bucket,
       count(*)::BIGINT AS n_docs,
       sum(tokens)::BIGINT AS tokens_real,
       (count(*) * max(tokens))::BIGINT AS tokens_padded,
       round(1.0 - sum(tokens)::DOUBLE / (count(*) * max(tokens)), 6)
         AS padding_waste
FROM bucketed GROUP BY bucket
"""


@query("pack_length_buckets", oracle=_lenbucket_oracle())
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for padded-batch training efficiency: documents
    grouped into {LEN_BUCKETS} token-length deciles, each bucket
    reporting real vs padded token mass (pad-to-bucket-max) and the
    padding waste 1 - real/padded. Bucketing by length is the standard
    alternative to `pack_token_budget`'s concatenate-then-chunk when
    examples must stay intact (SFT, contrastive pairs, rerankers);
    the waste column IS the decision input — compare the bucketed
    waste against the one-bucket baseline (pad everything to global
    max) to justify the loader complexity.

    Boundaries are PERCENTILE_DISC over the token counts, folded to a
    broadcast row (the feature_quantile_binning discipline — no global
    sort); bucketing is a scan-fused comparison, stats one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", _tokens().cast("long").alias("tokens")
    ).transform(track)  # bounds fold + bucketing pass
    # pdisc-ok: percentile buffers one counter per DISTINCT value;
    # tokens is an integer bounded by the max document length (any
    # ingest enforces one), so the buffer is value-domain-bounded
    # (<= max_doc_tokens counters, independent of corpus size)
    bounds = docs.agg(
        *[
            F.expr(
                f"percentile_disc({k / LEN_BUCKETS}) "
                "WITHIN GROUP (ORDER BY tokens)"
            ).alias(f"q{k}")
            for k in range(1, LEN_BUCKETS)
        ]
    )
    bucket = F.lit(LEN_BUCKETS)
    for k in range(LEN_BUCKETS - 1, 0, -1):
        bucket = F.when(F.col("tokens") <= F.col(f"q{k}"), F.lit(k)).otherwise(
            bucket
        )
    bucketed = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "tokens", bucket.cast("long").alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tokens").cast("long").alias("tokens_real"),
        (F.count(F.lit(1)) * F.max("tokens")).cast("long").alias("tokens_padded"),
        F.round(
            F.lit(1.0)
            - F.sum("tokens") / (F.count(F.lit(1)) * F.max("tokens")),
            6,
        ).alias("padding_waste"),
    )


#: fixed context-window length (tokens) for harmonic best-fit packing.
#: 256 (not the 2048 packing BUDGET) so the sf-sized corpus (10-99
#: token docs) produces many size classes AND many windows per class —
#: the regime where the packing logic is actually exercised.
PACK_WINDOW = 256
#: sub-bucket count for the two-pass within-class rank (the
#: pack_curriculum_order / etl_dense_surrogate_ids discipline).
PACK_SUBBUCKETS = 64


def _bestfit_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(lower(trim(text)), ' '))::BIGINT AS tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 1000000
           AS shuf
  FROM documents
),
c AS (
  SELECT doc_id, tokens, ({PACK_WINDOW} // tokens)::BIGINT AS size_class,
         shuf
  FROM t WHERE tokens BETWEEN 1 AND {PACK_WINDOW}
),
r AS (
  SELECT doc_id, tokens, size_class,
         row_number() OVER (PARTITION BY size_class
                            ORDER BY shuf, doc_id) - 1 AS rk
  FROM c
)
SELECT doc_id, tokens, size_class,
       (rk // size_class)::BIGINT AS window_idx,
       (rk % size_class + 1)::BIGINT AS slot
FROM r
"""


@query("pack_bestfit_windows", oracle=_bestfit_oracle())
def pack_bestfit_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic size-class packing of documents into fixed-length
    context windows (Lee & Lee 1985's harmonic bin packing, the
    distributed-friendly form of best-fit-decreasing): a doc of
    `tokens` length lands in size class k = floor(W / tokens) — the
    largest k with k * tokens <= W — so every window of class k holds
    EXACTLY k docs and is guaranteed not to overflow. window_idx and
    slot follow from the within-class rank by pure arithmetic
    (rank // k, rank % k), which is why this beats sequential
    best-fit at 100 TB: classic BFD is a strict left-to-right fold
    (bin state after doc i depends on all docs < i — no parallel
    form), while the harmonic classifier is a scan-side expression
    plus one keyed shuffle. Padding waste is bounded per class:
    a class-k window wastes < W/(k+1) tokens (every member is
    > W/(k+1)), the invariant pinned in tests/test_llm.py.

    Docs longer than W are excluded here — they route to
    `chunk_context_windows` (the splitting packer above) first.

    Scale shape: the within-class rank does NOT use a class-sized
    window (classes are few and huge — the pack_curriculum_order
    lesson); it is the two-pass sub-bucket form — rank docs within
    (class, shuf-range sub-bucket), prefix-sum the tiny
    (class, sub-bucket) count relation into offsets, broadcast back.
    The deterministic md5 shuffle key both mixes doc order (so
    windows are content-diverse, not corpus-order runs) and gives
    uniform sub-bucket balance."""
    d = load_spread(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        _tokens().cast("long").alias("tokens"),
        _md5_bucket(F.col("doc_id"), 1_000_000).alias("shuf"),
    ).filter(
        (F.col("tokens") >= 1) & (F.col("tokens") <= PACK_WINDOW)
    ).withColumn(
        "size_class", F.floor(F.lit(PACK_WINDOW) / F.col("tokens")).cast("long")
    ).withColumn(
        # shuf is uniform on [0, 1e6); equal shuf => equal sub-bucket,
        # so bucket boundaries never split the (shuf, doc_id) order
        "sb", F.floor(F.col("shuf") / (1_000_000 // PACK_SUBBUCKETS)).cast("long")
    ).transform(track)  # counts pass + rank pass
    counts = docs.groupBy("size_class", "sb").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    offsets = counts.select(
        "size_class",
        "sb",
        F.coalesce(
            F.sum("cnt").over(
                W.partitionBy("size_class")
                .orderBy("sb")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    local = F.row_number().over(
        W.partitionBy("size_class", "sb").orderBy("shuf", "doc_id")
    )
    rk = (F.col("offset") + local - 1).cast("long")
    return docs.join(F.broadcast(offsets), ["size_class", "sb"]).select(
        "doc_id",
        "tokens",
        "size_class",
        F.floor(rk / F.col("size_class")).cast("long").alias("window_idx"),
        (rk % F.col("size_class") + 1).cast("long").alias("slot"),
    )


#: UniMax: epoch budget as a share of corpus tokens, and the max
#: number of epochs any single source may repeat (the overfit cap).
UNIMAX_BUDGET_FRAC = 0.8
UNIMAX_MAX_EPOCHS = 2


def _unimax_oracle() -> str:
    return f"""
WITH src AS (
  SELECT source,
         sum(len(string_split(lower(trim(text)), ' ')))::DOUBLE AS tokens
  FROM documents GROUP BY source
),
capd AS (
  SELECT source, tokens, tokens * {UNIMAX_MAX_EPOCHS} AS cap,
         count(*) OVER ()::BIGINT AS n,
         row_number() OVER (ORDER BY tokens * {UNIMAX_MAX_EPOCHS}, source)
           AS rk,
         coalesce(sum(tokens * {UNIMAX_MAX_EPOCHS})
             OVER (ORDER BY tokens * {UNIMAX_MAX_EPOCHS}, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cap_before,
         (SELECT {UNIMAX_BUDGET_FRAC} * sum(tokens) FROM src) AS budget
  FROM src
),
lvl AS (
  SELECT max((budget - cap_before) / (n - rk + 1)) AS level FROM capd
),
alloc AS (
  SELECT source, tokens, cap, least(cap, (SELECT level FROM lvl))
           AS alloc_tokens
  FROM capd
)
SELECT source, tokens::BIGINT AS src_tokens,
       round(alloc_tokens, 2) AS alloc_tokens,
       round(alloc_tokens / tokens, 6) AS epochs,
       (cap <= alloc_tokens + 1e-9) AS capped
FROM alloc
"""


@query("mix_unimax", oracle=_unimax_oracle())
def mix_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax source mixing (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): allocate an epoch token budget as UNIFORMLY as
    possible across sources, subject to a per-source repeat cap of
    ``UNIMAX_MAX_EPOCHS`` (= 2) epochs — the published successor to
    temperature sampling (`mix_temperature`) that stops head
    languages from swamping the mix without overfitting the tails.

    The water-filling recursion has a closed form once sources are
    sorted by capacity ascending: binding is a prefix property (if a
    cap binds, every smaller cap binds), so the water level is
    level = max over i of (budget - sum of caps before i) /
    (sources remaining from i), and alloc_i = min(cap_i, level) —
    prefix sums + one max over the SOURCE relation. One corpus scan folds per-source token counts
    (map-side combinable); everything after runs on the handful of
    source rows. Returns per-source allocation, effective epochs,
    and the binding-cap flag."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(_tokens().cast("long")).cast("double").alias("tokens")
    )
    budget = src.agg(
        (F.lit(UNIMAX_BUDGET_FRAC) * F.sum("tokens")).alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cap = F.col("tokens") * UNIMAX_MAX_EPOCHS
    # global-ok: source relation (a handful of rows)
    w_rk = W.orderBy(cap, "source")
    capd = src.select(
        "source",
        "tokens",
        cap.alias("cap"),
        F.row_number().over(w_rk).cast("long").alias("rk"),
        F.coalesce(
            F.sum(cap).over(
                # global-ok: source relation (a handful of rows)
                W.orderBy(cap, "source").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("cap_before"),
    ).crossJoin(F.broadcast(budget))
    lvl = capd.agg(
        F.max(
            (F.col("budget") - F.col("cap_before"))
            / (F.col("n") - F.col("rk") + 1)
        ).alias("level")
    )
    alloc = F.least(F.col("cap"), F.col("level"))
    return capd.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("tokens").cast("long").alias("src_tokens"),
        F.round(alloc, 2).alias("alloc_tokens"),
        F.round(alloc / F.col("tokens"), 6).alias("epochs"),
        (F.col("cap") <= alloc + 1e-9).alias("capped"),
    )


# ---------------------------------------------------------------------------
# Per-source quality-quantile selection
# ---------------------------------------------------------------------------

#: keep documents at or above their source's QT_Q quality quantile.
QT_Q = 0.7

#: threshold grid resolution: quality scores live in [0, 1], so
#: rounding to 3 decimals bounds the per-source score histogram at
#: 1001 rows regardless of corpus size — the value-histogram quantile
#: device (feature_quantile_binning) applied to a score column.
QT_GRID_DECIMALS = 3


def _topq_oracle() -> str:
    from .text import QUALITY_SCORE_SQL

    return f"""
WITH t AS (
  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS ws
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         {QUALITY_SCORE_SQL} AS qscore,
         round({QUALITY_SCORE_SQL}, {QT_GRID_DECIMALS}) AS g
  FROM t
),
hist AS (
  SELECT source, g, count(*)::BIGINT AS cnt FROM scored GROUP BY 1, 2
),
cum AS (
  SELECT source, g, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY g
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS c,
         sum(cnt) OVER (PARTITION BY source)::BIGINT AS n
  FROM hist
),
thr AS (
  SELECT source, min(g) AS threshold
  FROM cum WHERE c >= {QT_Q!r} * n GROUP BY source
)
SELECT s.doc_id, s.source, s.qscore, thr.threshold
FROM scored s JOIN thr ON thr.source = s.source
WHERE s.g >= thr.threshold
"""


@query("mix_quality_topq", oracle=_topq_oracle())
def mix_quality_topq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-quantile gate (the Ask-LLM / classifier-
    threshold selection pattern, Sachdeva et al. 2024): keep each
    document whose quality score reaches its OWN source's {QT_Q}
    quantile, so every source contributes its best (1 - {QT_Q})
    tail instead of one global threshold draining low-scoring
    sources entirely — the selection step a mixture pipeline runs
    before `mix_sources`/`mix_unimax` rebalance what survives.

    The per-source threshold is exact PERCENTILE_DISC semantics on
    the score GRID (scores round to {QT_GRID_DECIMALS} decimals):
    the smallest grid value whose cumulative count reaches
    {QT_Q} * n_source. A data-sized ORDER BY per source would not
    distribute; the grid histogram is one map-side-combined
    aggregate to <= sources x 1001 rows, thresholds fold on that
    bounded relation, and selection is a broadcast join back into
    the scan — the same two-pass value-histogram shape as
    `feature_quantile_binning`, applied to corpus curation.

    100 TB shape: two scans of documents (score+histogram, then
    score+filter) and zero data-sized shuffles — the document text
    itself never moves."""
    from .text import quality_score_col

    # load_spread: the quality expression is compute-bound per row
    # (word split + four array folds); a single-file documents table
    # would otherwise run the whole corpus on one core (the r10
    # under-splitting lesson, re-measured here at the 100x replica:
    # 2 partitions -> full width).
    d = load_spread(spark, sf_dir, "documents")
    score = quality_score_col()
    scored = d.select(
        "doc_id",
        "source",
        score.alias("qscore"),
        F.round(score, QT_GRID_DECIMALS).alias("g"),
    )
    hist = scored.groupBy("source", "g").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        W.partitionBy("source").orderBy("g").rowsBetween(W.unboundedPreceding, 0)
    )
    wsrc = W.partitionBy("source")
    cum = hist.select(
        "source",
        "g",
        F.sum("cnt").over(wcum).cast("long").alias("c"),
        F.sum("cnt").over(wsrc).cast("long").alias("n"),
    )
    thr = (
        cum.filter(F.col("c") >= QT_Q * F.col("n"))
        .groupBy("source")
        .agg(F.min("g").alias("threshold"))
    )
    return scored.join(F.broadcast(thr), "source").filter(
        F.col("g") >= F.col("threshold")
    ).select("doc_id", "source", "qscore", "threshold")


# ---------------------------------------------------------------------------
# End-to-end corpus assembly (r12, r11 verdict #5): the composed run
# ---------------------------------------------------------------------------

#: benchmark split for the contamination screen (decontaminate_ngram's
#: convention: doc_id % mod == 0 plays the held-out eval suite).
PIPE_BENCH_MOD = 37
#: contamination shingle width (words).
PIPE_GRAM_N = 4
#: near-dup edge threshold on the minhash agreement estimate.
PIPE_TAU = 0.5
#: epoch token budget as a share of the CLEAN corpus's tokens.
PIPE_BUDGET_FRAC = 0.5
#: UniMax per-source repeat cap (epochs).
PIPE_MAX_EPOCHS = 2
#: packed context-window length (tokens).
PIPE_CTX = 512
#: deterministic shuffle-order modulus for the greedy fill.
PIPE_SHUF_MOD = 1_000_000


def _assembly_pipeline_oracle() -> str:
    from .dedup import (
        N_BANDS,
        N_MINHASH,
        _BAND_SQL,
        _BASEHASH_SQL,
        _MINHASH_COLS_SQL,
        _SHINGLES_SQL,
    )
    from .text import QUALITY_SCORE_SQL

    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band_idx, band{b} AS band_hash FROM banded"
        for b in range(N_BANDS)
    )
    sig_list = ", ".join(f"mh{k}" for k in range(N_MINHASH))
    g = PIPE_GRAM_N
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS ws
  FROM documents WHERE doc_id % {PIPE_BENCH_MOD} <> 0
),
scored AS (
  SELECT doc_id, source, ws, len(ws)::BIGINT AS n_words,
         round({QUALITY_SCORE_SQL}, {QT_GRID_DECIMALS}) AS g
  FROM docs
),
hist AS (SELECT source, g, count(*)::BIGINT AS cnt FROM scored GROUP BY 1, 2),
cum AS (
  SELECT source, g,
         sum(cnt) OVER (PARTITION BY source ORDER BY g
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS c,
         sum(cnt) OVER (PARTITION BY source)::BIGINT AS n
  FROM hist
),
thr AS (
  SELECT source, min(g) AS threshold
  FROM cum WHERE c >= {QT_Q!r} * n GROUP BY source
),
kept AS (
  SELECT s.doc_id, s.source, s.ws, s.n_words
  FROM scored s JOIN thr ON thr.source = s.source
  WHERE s.g >= thr.threshold
),
sh AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL.strip()}) AS sh FROM kept
),
hashed AS (SELECT doc_id, {_BASEHASH_SQL} AS hs FROM sh),
sig AS (SELECT doc_id, {_MINHASH_COLS_SQL} FROM hashed),
banded AS (
  SELECT doc_id, [{sig_list}] AS sig, {_BAND_SQL} FROM sig
),
band_rows AS (
  {band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band_rows a JOIN band_rows b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  WHERE list_sum(list_transform(generate_series(1, {N_MINHASH}),
          i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
        / {N_MINHASH}.0 >= {PIPE_TAU}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM kept
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
),
comp AS (SELECT node AS doc_id, min(r) AS canon FROM reach GROUP BY node),
dedup AS (
  SELECT k.* FROM kept k JOIN comp c USING (doc_id) WHERE c.canon = k.doc_id
),
bgrams AS (
  SELECT DISTINCT array_to_string(list_slice(ws, p, p + {g - 1}), ' ') AS ngram
  FROM (SELECT ws, unnest(generate_series(1, len(ws) - {g - 1})) AS p
        FROM (SELECT string_split(lower(trim(text)), ' ') AS ws
              FROM documents WHERE doc_id % {PIPE_BENCH_MOD} = 0))
),
dgrams AS (
  SELECT doc_id, array_to_string(list_slice(ws, p, p + {g - 1}), ' ') AS ngram
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - {g - 1})) AS p
        FROM dedup)
),
contaminated AS (
  SELECT DISTINCT d.doc_id FROM dgrams d JOIN bgrams USING (ngram)
),
clean AS (
  SELECT * FROM dedup
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
srctok AS (
  SELECT source, sum(n_words)::DOUBLE AS tokens FROM clean GROUP BY source
),
bud AS (
  SELECT {PIPE_BUDGET_FRAC} * sum(tokens) AS budget,
         count(*)::BIGINT AS n
  FROM srctok
),
capd AS (
  SELECT source, tokens, tokens * {PIPE_MAX_EPOCHS} AS cap,
         row_number() OVER (ORDER BY tokens * {PIPE_MAX_EPOCHS}, source)
           ::BIGINT AS rk,
         coalesce(sum(tokens * {PIPE_MAX_EPOCHS}) OVER (
           ORDER BY tokens * {PIPE_MAX_EPOCHS}, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cap_before
  FROM srctok
),
lvl AS (
  SELECT max((budget - cap_before) / (n - rk + 1)) AS level
  FROM capd CROSS JOIN bud
),
alloc AS (
  SELECT source, tokens,
         floor(least(cap, level))::BIGINT AS alloc_tokens,
         (floor(least(cap, level))::BIGINT >= floor(tokens * {PIPE_MAX_EPOCHS})::BIGINT)
           AS capped
  FROM capd CROSS JOIN lvl
),
ordered AS (
  SELECT c.source, c.n_words, a.alloc_tokens,
         coalesce(sum(c.n_words) OVER (
           PARTITION BY c.source
           ORDER BY ('0x' || substr(md5(c.doc_id::VARCHAR), 1, 8))::UBIGINT
                      % {PIPE_SHUF_MOD}, c.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM clean c JOIN alloc a USING (source)
),
packed AS (
  SELECT source,
         count(*) FILTER (WHERE cum_before < alloc_tokens)::BIGINT
           AS docs_packed,
         coalesce(sum(n_words) FILTER (WHERE cum_before < alloc_tokens), 0)
           ::BIGINT AS tokens_packed
  FROM ordered GROUP BY source
),
c0 AS (SELECT source, count(*)::BIGINT AS docs_in FROM scored GROUP BY source),
c1 AS (SELECT source, count(*)::BIGINT AS docs_quality_kept
       FROM kept GROUP BY source),
c2 AS (SELECT source, count(*)::BIGINT AS docs_after_dedup
       FROM dedup GROUP BY source),
c3 AS (SELECT source, count(*)::BIGINT AS docs_clean,
              sum(n_words)::BIGINT AS tokens_clean
       FROM clean GROUP BY source)
SELECT c0.source, docs_in, docs_quality_kept,
       (docs_quality_kept - docs_after_dedup)::BIGINT AS dups_removed,
       (docs_after_dedup - docs_clean)::BIGINT AS contaminated_removed,
       docs_clean, tokens_clean,
       a.alloc_tokens,
       round(a.alloc_tokens::DOUBLE / a.tokens, 6) AS epochs,
       a.capped,
       p.docs_packed, p.tokens_packed,
       ceil(p.tokens_packed::DOUBLE / {PIPE_CTX})::BIGINT AS n_windows,
       CASE WHEN p.tokens_packed = 0 THEN 0.0
            ELSE round(p.tokens_packed::DOUBLE
                       / (ceil(p.tokens_packed::DOUBLE / {PIPE_CTX})
                          * {PIPE_CTX}), 6) END AS pack_efficiency
FROM c0
JOIN c1 USING (source) JOIN c2 USING (source) JOIN c3 USING (source)
JOIN alloc a USING (source) JOIN packed p USING (source)
"""


@query("corpus_assembly_pipeline", oracle=_assembly_pipeline_oracle())
def corpus_assembly_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-corpus assembly run, composed from the
    already-verified stage operators into one query (r11 verdict #5 —
    the query a 100 TB training-data user actually runs, previously
    five separate stages): per-source quality-quantile gate
    (`mix_quality_topq`'s bounded-histogram thresholds at q={QT_Q}) ->
    near-dup dedup among survivors (`dedup_minhash_lsh` banded
    candidates at agreement >= {PIPE_TAU}, closed into entity
    clusters by `connected_components` min-label propagation, keep
    the smallest doc_id per cluster) -> benchmark decontamination
    (`decontaminate_ngram`'s {PIPE_GRAM_N}-gram screen against the
    doc_id % {PIPE_BENCH_MOD} == 0 eval split) -> UniMax allocation
    over the clean corpus (`mix_unimax`'s closed-form water filling,
    budget {PIPE_BUDGET_FRAC:.0%} of clean tokens, cap
    {PIPE_MAX_EPOCHS} epochs) -> greedy window packing
    (`mix_token_budget`'s md5-shuffled admission until each source's
    allocation is spent, reported as {PIPE_CTX}-token concat-packed
    windows). One row per source: stage-by-stage yields, the UniMax
    plan, and the packed-epoch manifest.

    100 TB shape, stage by stage (each inherits its parent
    operator's measured discipline): the quality gate is two scans +
    a sources x 1001 histogram (document text never shuffles); the
    dedup stage shuffles band-hash keys only (candidates track
    duplicate density, `shuffle_hash`-pinned inside
    `minhash_lsh_pairs` against the misestimated-broadcast class),
    and CC state is two longs per KEPT doc; the contamination screen
    explodes grams on dedup SURVIVORS only and probes a broadcast
    benchmark set (eval suites are MBs); UniMax and the final report
    run on source-sized relations; packing is one per-source cumsum
    window over the md5 order (the shard key at scale, so shards
    fill independently). Every verdict column is exact-integer or
    round-pinned, so the composed result is bit-equal to the
    recursive-CTE DuckDB twin."""
    from ..api import connected_components, minhash_lsh_pairs
    from .dedup import N_BANDS, N_MINHASH, SHINGLE
    from .text import quality_score_col

    d = load_spread(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % PIPE_BENCH_MOD != 0)
    score = quality_score_col()
    scored = train.select(
        "doc_id",
        "source",
        "text",
        _tokens().cast("long").alias("n_words"),
        F.round(score, QT_GRID_DECIMALS).alias("g"),
    ).transform(track)  # histogram + gate both read it
    hist = scored.groupBy("source", "g").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        W.partitionBy("source").orderBy("g").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = hist.select(
        "source",
        "g",
        F.sum("cnt").over(wcum).cast("long").alias("c"),
        F.sum("cnt").over(W.partitionBy("source")).cast("long").alias("n"),
    )
    thr = (
        cum.filter(F.col("c") >= QT_Q * F.col("n"))
        .groupBy("source")
        .agg(F.min("g").alias("threshold"))
    )
    kept = (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("g") >= F.col("threshold"))
        .select("doc_id", "source", "text", "n_words")
        .transform(track)  # minhash arms + grams + counts consume it
    )
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", n_hashes=N_MINHASH, n_bands=N_BANDS,
        shingle=SHINGLE,
    ).filter(F.col("est_jaccard") >= PIPE_TAU)
    comp = connected_components(pairs, "doc_a", "doc_b")
    dedup = (
        kept.join(comp, kept.doc_id == comp.node, "left")
        .filter(
            F.coalesce(F.col("component_id"), kept.doc_id) == kept.doc_id
        )
        .select("doc_id", "source", "text", "n_words")
        .transform(track)  # grams + counts + clean consume it
    )

    def grams(df: DataFrame) -> DataFrame:
        tok = df.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.trim("text")), " ")).alias(
                "pos", "w"
            ),
        )
        win = W.partitionBy("doc_id").orderBy("pos")
        leads = [F.col("w")] + [
            F.lead("w", k).over(win) for k in range(1, PIPE_GRAM_N)
        ]
        return tok.select(
            "doc_id",
            F.concat_ws(" ", *leads).alias("ngram"),
            leads[-1].alias("_tail"),
        ).filter(F.col("_tail").isNotNull()).drop("_tail")

    bench = grams(
        d.filter(F.col("doc_id") % PIPE_BENCH_MOD == 0)
    ).select("ngram").distinct()
    contaminated = (
        grams(dedup)
        .join(F.broadcast(bench), "ngram")  # eval suites are MBs
        .select("doc_id")
        .distinct()
    )
    clean = dedup.join(
        contaminated.hint("shuffle_hash"), "doc_id", "left_anti"  # shuffle_hash pin: corpus-scaled side, never broadcast (r11 sweep)
    ).transform(track)  # srctok + packing + counts consume it

    srctok = clean.groupBy("source").agg(
        F.sum("n_words").cast("double").alias("tokens")
    )
    bud = srctok.agg(
        (F.lit(PIPE_BUDGET_FRAC) * F.sum("tokens")).alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cap = F.col("tokens") * PIPE_MAX_EPOCHS
    # global-ok: source relation (a handful of rows)
    w_rk = W.orderBy(cap, "source")
    capd = srctok.select(
        "source",
        "tokens",
        cap.alias("cap"),
        F.row_number().over(w_rk).cast("long").alias("rk"),
        F.coalesce(
            F.sum(cap).over(
                # global-ok: source relation (a handful of rows)
                W.orderBy(cap, "source").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("cap_before"),
    ).crossJoin(F.broadcast(bud))
    lvl = capd.agg(
        F.max(
            (F.col("budget") - F.col("cap_before"))
            / (F.col("n") - F.col("rk") + 1)
        ).alias("level")
    )
    alloc_l = F.floor(F.least(F.col("cap"), F.col("level"))).cast("long")
    alloc = capd.crossJoin(F.broadcast(lvl)).select(
        "source",
        "tokens",
        alloc_l.alias("alloc_tokens"),
        # explicit floor on BOTH engines (oracle spells
        # floor(...)::BIGINT) so the flag is truncation-mode
        # independent — cast('long') truncates toward zero while
        # DuckDB ::BIGINT rounds half-even, and they agreed only
        # while the cap happened to be integer-valued (r12 advice).
        (alloc_l >= F.floor(cap).cast("long")).alias("capped"),
    )
    wpack = (
        W.partitionBy("source")
        .orderBy("shuf", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = (
        clean.select(
            "doc_id",
            "source",
            "n_words",
            _md5_bucket(F.col("doc_id"), PIPE_SHUF_MOD).alias("shuf"),
        )
        .join(F.broadcast(alloc.select("source", "alloc_tokens")), "source")
        .select(
            "source",
            "n_words",
            "alloc_tokens",
            F.coalesce(F.sum("n_words").over(wpack), F.lit(0)).alias(
                "cum_before"
            ),
        )
    )
    admitted = F.col("cum_before") < F.col("alloc_tokens")
    packed = ordered.groupBy("source").agg(
        F.sum(admitted.cast("int")).cast("long").alias("docs_packed"),
        F.coalesce(F.sum(F.when(admitted, F.col("n_words"))), F.lit(0))
        .cast("long")
        .alias("tokens_packed"),
    )

    c0 = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_in")
    )
    c1 = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_quality_kept")
    )
    c2 = dedup.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_after_dedup")
    )
    c3 = clean.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_clean"),
        F.sum("n_words").cast("long").alias("tokens_clean"),
    )
    n_windows = F.ceil(F.col("tokens_packed") / F.lit(float(PIPE_CTX))).cast(
        "long"
    )
    return (
        c0.join(c1, "source")
        .join(c2, "source")
        .join(c3, "source")
        .join(alloc, "source")
        .join(packed, "source")
        .select(
            "source",
            "docs_in",
            "docs_quality_kept",
            (F.col("docs_quality_kept") - F.col("docs_after_dedup"))
            .cast("long")
            .alias("dups_removed"),
            (F.col("docs_after_dedup") - F.col("docs_clean"))
            .cast("long")
            .alias("contaminated_removed"),
            "docs_clean",
            "tokens_clean",
            "alloc_tokens",
            F.round(
                F.col("alloc_tokens").cast("double") / F.col("tokens"), 6
            ).alias("epochs"),
            "capped",
            "docs_packed",
            "tokens_packed",
            n_windows.alias("n_windows"),
            F.when(F.col("tokens_packed") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("tokens_packed").cast("double")
                    / (n_windows * PIPE_CTX),
                    6,
                )
            )
            .alias("pack_efficiency"),
        )
    )
