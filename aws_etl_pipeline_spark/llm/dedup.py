"""Deduplication for LLM data pipelines (north star, SURVEY §2B).

Five dedup families, each designed for the 100 TB path:

  * exact           — hash-groupBy on a normalized fingerprint (one
                      shuffle on a 128-bit key, no text movement)
  * n-gram Jaccard  — blocked pairwise shingle-set similarity
  * MinHash + LSH   — md5-derived minhash signatures, banded into LSH
                      buckets; only same-bucket pairs are compared
                      (the candidate set, not O(n²))
  * SimHash         — 16-bit sign-of-weighted-bits fingerprint with
                      Hamming-distance pairing
  * embedding cosine— near-dup by vector similarity within a block

All hashing is md5-based so Spark and DuckDB compute identical
signatures — the oracle verifies the *hashes*, not just row counts.
MLlib's MinHashLSH/BucketedRandomProjectionLSH offer the same
algorithms with opaque seeds; this implementation trades them for
cross-engine verifiability at identical plan shape and cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load_spread, load_spread_keyed, load_table
from ..registry import query

N_MINHASH = 16  # minhash permutations
N_BANDS = 4  # LSH bands (4 rows/band)
SHINGLE = 3  # words per shingle


def _words() -> F.Column:
    return F.split(F.lower(F.trim(F.col("text"))), " ")


# Shingle convention (both engines, all dedup operators): one shingle
# per word position 1..n, clamped at the tail — so the last two
# positions yield 2- and 1-word shingles. This matches the window-lead
# formulation (concat_ws drops the null leads) that keeps the Spark
# side in whole-stage codegen.


def _shingles_spark(ws: F.Column) -> F.Column:
    """Clamped 3-word shingles as an array column (interpreted
    higher-order transform — fine for set-valued uses like Jaccard;
    the minhash hot path uses the codegen window-lead form instead)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(ws)),
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(ws, (i + off).cast("int")) for off in range(SHINGLE)],
        ),
    )


_SHINGLES_SQL = f"""
list_transform(
  generate_series(1, len(ws)),
  i -> array_to_string(ws[i:i+{SHINGLE - 1}], ' '))
"""


@query(
    "dedup_exact",
    oracle="""
WITH fp AS (
  SELECT doc_id, md5(lower(trim(text))) AS content_md5 FROM documents
)
SELECT content_md5,
       min(doc_id)::BIGINT AS keeper_doc_id,
       count(*)::BIGINT    AS n_copies
FROM fp GROUP BY content_md5
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by normalized-content hash, keep the lowest
    doc_id. At scale: shuffle 16-byte keys, never the documents. (No
    pre-spread: the groupBy itself redistributes, and the map side is
    one cheap md5 per row.)"""
    from ..api import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "doc_id", text_col="text")


PASSAGE_W = 12  # words per passage window
PASSAGE_STRIDE = 6  # window start offset


@query(
    "dedup_substring",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents
),
p AS (
  SELECT doc_id,
         md5(array_to_string(ws[i:i+{PASSAGE_W - 1}], ' ')) AS passage_md5
  FROM t, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - {PASSAGE_W - 1}, {PASSAGE_STRIDE})) AS i
  ) u
  WHERE len(ws) >= {PASSAGE_W}
)
SELECT passage_md5,
       count(*)::BIGINT            AS n_occurrences,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       min(doc_id)::BIGINT         AS keeper_doc_id
FROM p GROUP BY passage_md5 HAVING count(*) > 1
""",
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring (passage-level) dedup: repeated {PASSAGE_W}-word
    passages ACROSS documents — the cross-document boilerplate /
    repeated-template detector document-level dedup can't see (a doc
    is unique overall yet shares a header or license block with
    thousands of others). Suffix-array exact-substring dedup is
    single-node; the distributable form hashes full sliding windows
    (stride {PASSAGE_STRIDE}) and groups on the 16-byte hash, exactly
    dedup_exact's bucketed shuffle discipline — hashes move, text
    doesn't, reduce state is one row per distinct repeated passage."""
    from ..api import passage_dedup

    d = load_spread_keyed(spark, sf_dir, "documents", "doc_id")
    return passage_dedup(
        d, "doc_id", "text", window=PASSAGE_W, stride=PASSAGE_STRIDE
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         AS jaccard
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: Jaccard over 3-word shingle sets for
    same-language pairs above 0.05. Blocking (here: lang) bounds the
    pair count; at 100 TB the block key becomes an LSH bucket (next
    query) so candidates stay ~linear."""
    from ..api import jaccard_pairs

    d = load_spread(spark, sf_dir, "documents")
    return jaccard_pairs(d, "doc_id", "text", block_col="lang", threshold=0.05)


# Universal-hash permutation constants: minhash_k = min((a_k*h + b_k) mod P)
# over base hashes h — ONE md5 per shingle instead of N_MINHASH of them,
# then 16 integer mixes. P = 2^31-1 keeps a*h within BIGINT on both engines.
_P = 2_147_483_647


def _perm_constants() -> list[tuple[int, int]]:
    import hashlib as _hl

    out = []
    for k in range(N_MINHASH):
        a = int(_hl.md5(f"a{k}".encode()).hexdigest()[:8], 16) % (_P - 1) + 1
        b = int(_hl.md5(f"b{k}".encode()).hexdigest()[:8], 16) % _P
        out.append((a, b))
    return out


_PERMS = _perm_constants()

#: base hash of one shingle (md5 -> 60-bit int -> mod P), SQL side
_BASEHASH_SQL = (
    f"list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT % {_P})"
)

_MINHASH_COLS_SQL = ",\n         ".join(
    f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_P})) AS mh{k}"
    for k, (a, b) in enumerate(_PERMS)
)


_BAND_SQL = ",\n       ".join(
    "md5(" + " || '_' || ".join(f"mh{k}" for k in range(b * 4, b * 4 + 4)) + f") AS band{b}"
    for b in range(N_BANDS)
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents)
),
hashed AS (
  SELECT doc_id, {_BASEHASH_SQL} AS hs FROM t
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS_SQL}
  FROM hashed
),
banded AS (
  SELECT doc_id, [{", ".join(f"mh{k}" for k in range(N_MINHASH))}] AS sig,
       {_BAND_SQL}
  FROM sig
),
band_rows AS (
  SELECT doc_id, sig, 0 AS band_idx, band0 AS band_hash FROM banded
  UNION ALL SELECT doc_id, sig, 1, band1 FROM banded
  UNION ALL SELECT doc_id, sig, 2, band2 FROM banded
  UNION ALL SELECT doc_id, sig, 3, band3 FROM banded
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(list_sum(list_transform(generate_series(1, {N_MINHASH}),
               i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
             / {N_MINHASH}.0, 6) AS est_jaccard
FROM band_rows a JOIN band_rows b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 16 md5-derived minhashes, 4
    bands of 4; pairs sharing any band bucket are candidates, scored
    by signature agreement (estimated Jaccard).

    Scale path: the band join is an equi-join on band hashes — the
    shuffle is on bucket keys and only same-bucket docs ever meet, so
    cost tracks the duplicate density, not n². Deterministic md5
    hashing replaces MLlib MinHashLSH's seeded perm for oracle parity.
    """
    from ..api import minhash_lsh_pairs

    d = load_spread_keyed(spark, sf_dir, "documents", "doc_id")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=N_MINHASH, n_bands=N_BANDS, shingle=SHINGLE
    )


@query(
    "dedup_simhash",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, w,
         ('0x' || substr(md5(w), 1, 15))::UBIGINT::BIGINT AS h
  FROM words
),
bits AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS weight
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       sum(CASE WHEN weight > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint: per-word md5 bit votes, sign-
    aggregated per bit position. Near-dups then pair by small Hamming
    distance (tests/test_llm.py); the fingerprint itself is verified
    here bit-for-bit against the oracle."""
    from ..api import simhash as simhash_op

    d = load_spread(spark, sf_dir, "documents")
    return simhash_op(d, "doc_id", "text", bits=16)


@query(
    "dedup_embedding_cosine",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: same-label pairs with cosine >= 0.35.
    Blocking on label keeps the pair space linear-ish; the 100 TB form
    replaces the label block with LSH buckets (see similarity.py)."""
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
    # persist: the cast+norm pipeline feeds both self-join sides.
    n = track(n)
    a = n.alias("a")
    b = n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        # corpus x corpus candidate join: NEVER broadcast-eligible —
        # plan-time size estimates derive from the compressed file and
        # under-count exploded band/shingle relations by 100x+ (the r10
        # 1000x replica broadcast a 4 GB side and blew maxResultSize);
        # the hint pins a shuffle join regardless of estimates.
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


MLLIB_DUP_TAU = 0.2  # exact target set: same-lang pairs with jaccard >= 0.2
MLLIB_RECALL_TOL = 0.8  # measured MinHashLSH recall at tau=0.2: 1.0 (sf0.01 and sf0.1)


@query(
    "dedup_minhash_mllib",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         AS jaccard,
       true AS recall_ok
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {MLLIB_DUP_TAU}
""",
)
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib's MinHashLSH over HashingTF shingle vectors with a
    recall-tolerance verdict (MLlib's hash family is JVM-seeded, not
    SQL-reproducible; the md5 variant is the hash-exact one): the
    query emits the EXACT near-dup pairs (same-lang shingle Jaccard
    >= 0.2 — strong pairs, where 4-table OR-amplification recall is
    1-(1-s)^4 >= 0.59 theoretically, 1.0 measured) plus a boolean
    ``recall_ok`` = fraction of exact pairs surfaced by MLlib
    ``approxSimilarityJoin`` >= 0.8. The oracle returns the same
    exact pairs and literal true, so a candidate-generation
    regression in the MLlib path flips the hash."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..api import jaccard_pairs

    d = load_spread(spark, sf_dir, "documents")
    exact = jaccard_pairs(d, "doc_id", "text", block_col="lang", threshold=MLLIB_DUP_TAU)

    # materialize the token array before shingling: a lambda closing
    # over the split() EXPRESSION re-evaluates it per element_at
    # (the r9 text_boilerplate_ngrams lesson, measured ~9x)
    t = d.select("doc_id", _words().alias("ws")).select(
        "doc_id", _shingles_spark(F.col("ws")).alias("sh")
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(t).filter(F.expr("size(sh) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    found = (
        model.approxSimilarityJoin(feats, feats, 0.95, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.lit(1).alias("hit"),
        )
    )
    recall = exact.join(found, ["doc_a", "doc_b"], "left").agg(
        (
            F.coalesce(F.sum("hit").cast("double") / F.count(F.lit(1)), F.lit(1.0))
            >= MLLIB_RECALL_TOL
        ).alias("recall_ok")
    )
    return exact.crossJoin(F.broadcast(recall))


@query(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang,
         list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
), comp AS (
  SELECT node AS doc_id, min(r) AS component_id FROM reach GROUP BY node
)
SELECT doc_id::BIGINT AS doc_id, component_id::BIGINT AS component_id,
       (count(*) OVER (PARTITION BY component_id))::BIGINT AS cluster_size
FROM comp
""",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: near-dup pairs (same-lang shingle
    Jaccard >= 0.05) become an undirected graph; each doc gets the
    smallest doc_id in its connected component as cluster id (the
    canonical keeper), plus the cluster size. Singletons keep their own
    id. Spark side is iterative min-label propagation
    (api.connected_components); the oracle is a DuckDB recursive-CTE
    transitive closure — the closure is O(component_size^2) rows so it
    only works as a small-SF oracle, while the propagation loop is the
    100 TB path."""
    from ..api import connected_components, jaccard_pairs
    from pyspark.sql import Window as W

    d = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", block_col="lang", threshold=0.05)
    comp = connected_components(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(comp, docs.doc_id == comp.node, "left").select(
        docs.doc_id, F.coalesce("component_id", docs.doc_id).alias("component_id")
    )
    return assigned.select(
        "doc_id",
        "component_id",
        F.count("*").over(W.partitionBy("component_id")).cast("long").alias("cluster_size"),
    )


@query(
    "dedup_connected_components_star",
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang,
         list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
), comp AS (
  SELECT node AS doc_id, min(r) AS component_id FROM reach GROUP BY node
)
SELECT doc_id::BIGINT AS doc_id, component_id::BIGINT AS component_id,
       (count(*) OVER (PARTITION BY component_id))::BIGINT AS cluster_size
FROM comp
""",
)
def dedup_connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HIGH-DIAMETER form of dedup_connected_components: identical
    contract (same pair graph, same (doc_id, component_id,
    cluster_size) output, same recursive-CTE oracle — the hash verdict
    therefore proves the two algorithms agree exactly), but components
    come from api.connected_components_star — alternating large-star /
    small-star rounds (Kiveris et al. 2014) that converge in O(log^2 n)
    rounds regardless of graph diameter, where min-label propagation
    needs O(diameter). Near-dup cluster graphs have tiny diameters, so
    the propagation loop stays the default; THIS is the variant a
    100 TB corpus graph with chain structure (link graphs, citation
    chains, co-editing paths) must switch to — the r8 answer to the
    r7 verdict's large-diameter question, measured side by side in
    SCALING.md."""
    from ..api import connected_components_star, jaccard_pairs
    from pyspark.sql import Window as W

    d = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", block_col="lang", threshold=0.05)
    comp = connected_components_star(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(comp, docs.doc_id == comp.node, "left").select(
        docs.doc_id, F.coalesce("component_id", docs.doc_id).alias("component_id")
    )
    return assigned.select(
        "doc_id",
        "component_id",
        F.count("*").over(W.partitionBy("component_id")).cast("long").alias("cluster_size"),
    )


@query(
    "dedup_keep_best",
    oracle="""
WITH fp AS (
  SELECT doc_id, source, n_chars, md5(lower(trim(text))) AS content_md5
  FROM documents
)
SELECT doc_id, source, n_chars, content_md5
FROM fp
QUALIFY row_number() OVER (
  PARTITION BY content_md5
  ORDER BY n_chars DESC, doc_id ASC
) = 1
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy dedup: among exact duplicates keep the BEST copy (longest
    text, doc_id as the deterministic tie-break), not an arbitrary one
    — the keep-rule real corpus dedup uses (prefer the canonical /
    richest-metadata copy). One window over the hash-partitioned
    fingerprints: the shuffle moves (16-byte hash, score) pairs, never
    document bodies, and per-group state is a single running best —
    identical shape at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("content_md5").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("content_md5"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "dedup_containment",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             least(len(a.sh), len(b.sh)), 6) AS containment
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      least(len(a.sh), len(b.sh)) >= 0.2
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) near-dup: |A∩B| / min(|A|,|B|)
    over shingle sets for same-language pairs — catches a short
    document QUOTED INSIDE a longer one, which Jaccard structurally
    misses (the union denominator dilutes subset overlap toward 0 as
    the length ratio grows; containment stays 1.0). The curation
    companion to dedup_substring: that flags the shared passage
    itself, this flags the document pair.

    Same blocked pairwise shape as dedup_ngram_jaccard (the lang block
    bounds candidates; the 100 TB LSH-bucket-blocked spelling SHIPS as
    dedup_containment_lsh below), so it shares the recall-oracle role
    for the LSH paths — and shares the implementation:
    api.jaccard_pairs with the containment denominator."""
    from ..api import jaccard_pairs

    d = load_spread(spark, sf_dir, "documents")
    return jaccard_pairs(
        d, "doc_id", "text", block_col="lang", threshold=0.2, measure="containment"
    )


SEMDEDUP_TAU = 0.35  # within-cell cosine above which the lower-priority copy is pruned


def _semdedup_oracle() -> str:
    from .similarity import K_CELLS, KMEANS_ITERS, _kmeans_blocks

    blocks = _kmeans_blocks(K_CELLS, KMEANS_ITERS)
    last = KMEANS_ITERS - 1
    return (
        "WITH " + ",".join(blocks) + f""",
mem AS (
  SELECT a.vec_id, a.cell, a.v,
         sqrt(list_sum(list_transform(a.v, x -> x * x))) AS nrm,
         round(list_dot_product(a.v, c.cv)
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.cv, x -> x * x)))), 6) AS ccos
  FROM assign{last} a JOIN cent{last + 1} c USING (cell)
),
pruned AS (
  SELECT DISTINCT b.vec_id
  FROM mem a JOIN mem b
    ON a.cell = b.cell
   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {SEMDEDUP_TAU}
)
SELECT m.vec_id, m.cell, m.ccos AS centroid_cos,
       (p.vec_id IS NULL) AS kept
FROM mem m LEFT JOIN pruned p ON m.vec_id = p.vec_id
"""
    )


def semdedup_frame(
    spark: SparkSession, sf_dir: str, k: int, iters: int, tau: float
) -> DataFrame:
    """Parameterized SemDeDup pipeline under :func:`dedup_semantic` —
    exposed separately because **k is the scale knob the SCALING.md
    claim rests on** (the paper's ~100k cells per 100M embeddings):
    `tools/measure_semdedup_k.py` runs this at k=8 vs k=64 on the 10x
    replica to demonstrate that holding |cell| constant by scaling k
    is literally a parameter change, not a rewrite. The registered
    query pins k=K_CELLS so the DuckDB oracle replays it exactly."""
    from .similarity import _as_double, _dot, _norm, lloyd_assign

    e = load_spread(spark, sf_dir, "embeddings")
    base = e.select("vec_id", _as_double("embedding").alias("v"))
    assign, cent = lloyd_assign(base, k, iters)
    centn = cent.select("cell", "cv", _norm(F.col("cv")).alias("cnrm"))
    mem = (
        assign.join(F.broadcast(centn), "cell")
        .select(
            "vec_id",
            "cell",
            "v",
            _norm(F.col("v")).alias("nrm"),
            F.round(
                _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * F.col("cnrm")),
                6,
            ).alias("ccos"),
        )
        .transform(track)  # feeds both sides of the within-cell pair join
    )
    a, b = mem.alias("a"), mem.alias("b")
    pair_cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    higher_priority = (F.col("a.ccos") < F.col("b.ccos")) | (
        (F.col("a.ccos") == F.col("b.ccos")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    pruned = (
        # corpus x corpus candidate join: NEVER broadcast-eligible —
        # plan-time size estimates derive from the compressed file and
        # under-count exploded band/shingle relations by 100x+ (the r10
        # 1000x replica broadcast a 4 GB side and blew maxResultSize);
        # the hint pins a shuffle join regardless of estimates.
        a.hint("shuffle_hash")
        .join(b, (F.col("a.cell") == F.col("b.cell")) & higher_priority)
        .filter(pair_cos >= tau)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_pruned", F.lit(True))
    )
    return (
        mem.join(pruned, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("ccos").alias("centroid_cos"),
            F.col("is_pruned").isNull().alias("kept"),
        )
    )


@query("dedup_semantic", oracle=_semdedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster the embedding corpus with the deterministic
    Lloyd's k-means (similarity.lloyd_assign — seed = first k vectors,
    DECIMAL-exact means, so the DuckDB oracle replays the identical
    iterations), then WITHIN each cluster prune any vector whose
    cosine to a higher-priority member is >= {tau}. Priority follows
    the paper's keep-rule: LOW similarity to the cluster centroid wins
    (keep the atypical representative, prune the redundant core),
    vec_id breaking 6-decimal ties. Emits one row per vector —
    (vec_id, cell, centroid_cos, kept) — so the oracle hash pins the
    cluster assignment, the priority score, and the prune verdict.

    100 TB shape: candidate pairs exist only WITHIN a cell — never
    across — so the pair space is sum(|cell|^2), not n^2; in
    production k scales with the corpus (SemDeDup uses ~100k clusters
    for 100M embeddings) to hold cells at ~1k members, and each cell's
    pairwise block runs after ONE shuffle by cell id. Assignment never
    shuffles the corpus (broadcast centroids), the priority score is
    one broadcast join, and the final verdict is a left anti-shaped
    join on vec_id. Zero Python in the hot path — all fold/zip_with
    expression arithmetic."""
    from .similarity import K_CELLS, KMEANS_ITERS

    return semdedup_frame(spark, sf_dir, K_CELLS, KMEANS_ITERS, SEMDEDUP_TAU)


_BAND_ROWS_SQL = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, band{b} AS band_hash FROM banded"
    for b in range(N_BANDS)
)


@query(
    "dedup_containment_lsh",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents)
),
hashed AS (
  SELECT doc_id, {_BASEHASH_SQL} AS hs FROM t
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS_SQL}
  FROM hashed
),
banded AS (
  SELECT doc_id,
       {_BAND_SQL}
  FROM sig
),
band_rows AS (
  {_BAND_ROWS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band_rows a JOIN band_rows b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(ta.sh, tb.sh))::DOUBLE /
             least(len(ta.sh), len(tb.sh)), 6) AS containment
FROM cand c
JOIN t ta ON ta.doc_id = c.doc_a
JOIN t tb ON tb.doc_id = c.doc_b
WHERE len(list_intersect(ta.sh, tb.sh))::DOUBLE /
      least(len(ta.sh), len(tb.sh)) >= 0.2
""",
)
def dedup_containment_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup with LSH-bucket blocking — the promised
    100 TB spelling of dedup_containment: candidates come from the
    banded-minhash bucket equi-join (the same buckets dedup_minhash_lsh
    uses — only same-bucket docs ever meet, so cost tracks duplicate
    density, not n²), and only those candidates get the exact
    shingle-set overlap-coefficient score |A∩B| / min(|A|,|B|).

    Honest recall note (also on api.containment_lsh_pairs): minhash
    buckets collide on JACCARD, so a containment pair at an extreme
    length ratio (tiny Jaccard) can be missed; dedup_containment's
    length-blocked exact scan remains the recall oracle, and the
    subset-robust production candidate step is to sign the shorter
    side's passages (dedup_substring's windows) instead."""
    from ..api import containment_lsh_pairs

    d = load_spread_keyed(spark, sf_dir, "documents", "doc_id")
    return containment_lsh_pairs(
        d, "doc_id", "text", n_hashes=N_MINHASH, n_bands=N_BANDS,
        shingle=SHINGLE, threshold=0.2,
    )


@query(
    "dedup_url_canonical",
    oracle="""
WITH urls AS (
  SELECT doc_id, n_chars,
         'HTTPS://' || upper(source) || '.Example.COM/docs/'
           || (doc_id % 50) || '/?utm_source=feed&ref=' || doc_id AS raw_url
  FROM documents
),
canon AS (
  SELECT doc_id, n_chars,
         lower(regexp_extract(raw_url, '(?i)https?://([^/?#]+)', 1))
           || rtrim(regexp_extract(raw_url, '(?i)https?://[^/?#]+([^?#]*)', 1), '/')
           AS canonical_url
  FROM urls
)
SELECT canonical_url,
       count(*)::BIGINT AS n_docs,
       min(doc_id)::BIGINT AS keeper_doc_id,
       max(n_chars)::BIGINT AS max_chars
FROM canon
GROUP BY canonical_url
HAVING count(*) > 1
""",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the FIRST dedup pass of every
    web-crawl pipeline (C4/CCNet dedup by URL before touching
    content): lowercase the host, strip the query string (tracking
    params) and the trailing slash, then group by the canonical URL.
    URLs are synthesized with deliberate case/param/slash noise and a
    doc_id%50 path collision so canonical groups are non-trivial;
    emits the duplicate groups with the kept doc (min id — the
    'first crawl wins' policy).

    100 TB shape: canonicalization is a scan-fused string expression,
    the dedup ONE hash aggregation on the canonical key — strictly
    cheaper than any content dedup (no shingling, no signatures), which
    is why crawls run it first; the content tiers (exact md5, minhash,
    semantic) follow in `corpus_curation_pipeline` order."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed&ref="),
        F.col("doc_id").cast("string"),
    )
    canon = F.concat(
        F.lower(F.regexp_extract(raw, r"(?i)https?://([^/?#]+)", 1)),
        F.regexp_replace(
            F.regexp_extract(raw, r"(?i)https?://[^/?#]+([^?#]*)", 1), "/+$", ""
        ),
    )
    return (
        d.select("doc_id", "n_chars", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "dedup_soft_weights",
    oracle="""
WITH fp AS (
  SELECT doc_id, n_chars, md5(lower(trim(text))) AS content_md5
  FROM documents
),
cl AS (
  SELECT content_md5, count(*)::BIGINT AS cluster_size,
         sum(n_chars)::BIGINT AS cluster_tokens
  FROM fp GROUP BY 1
),
w AS (
  SELECT f.doc_id, c.cluster_size, f.n_chars,
         round(1.0 / c.cluster_size, 6) AS weight
  FROM fp f JOIN cl c USING (content_md5)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (cluster_size > 1) AS BIGINT) AS n_in_clusters,
       round(CAST(sum(CAST(weight AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS effective_docs,
       CAST(sum(n_chars) AS BIGINT) AS raw_chars,
       round(CAST(sum(CAST(weight * n_chars AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS effective_chars
FROM w
""",
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING duplicates, every
    document gets sampling weight 1/cluster_size, so a training
    sampler sees each unique content unit with equal total mass — the
    duplicate-aware reweighting from the data-curation literature
    that preserves rare-context copies hard dedup would delete (a
    page quoted 1000x still contributes once in expectation, but its
    1000 contexts all remain drawable). Clusters here are exact
    content fingerprints (`dedup_exact`'s md5); the same weighting
    composes unchanged over near-dup components — pipe
    `connected_components` output in as the cluster key.

    The emitted rollup is the curation dashboard: raw vs EFFECTIVE
    corpus size in documents and characters (effective = what the sampler
    actually draws from). Scale shape: one fingerprint shuffle to
    cluster sizes, one broadcast-joinable cluster table back over the
    scan, one global reduction; weights are exact 6-dp decimals
    summed through DECIMAL, so the effective sizes are
    order-independent and bit-equal across engines."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
    )
    cl = fp.groupBy("content_md5").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    w = fp.join(cl, "content_md5").select(
        "doc_id",
        "cluster_size",
        "n_chars",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
    )
    return w.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.col("cluster_size") > 1).cast("long").alias("n_in_clusters"),
        F.round(
            F.sum(F.col("weight").cast("decimal(18,6)")).cast("double"), 6
        ).alias("effective_docs"),
        F.sum("n_chars").cast("long").alias("raw_chars"),
        F.round(
            F.sum((F.col("weight") * F.col("n_chars")).cast("decimal(28,6)"))
            .cast("double"),
            6,
        ).alias("effective_chars"),
    )


def _incr_bloom_oracle() -> str:
    from ..operators.sketches import BLOOM_J, _bloom_pos_sql

    union_bits = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(j, 'fp')} AS pos FROM hist"
        for j in range(BLOOM_J)
    )
    probe_all = " AND ".join(
        f"{_bloom_pos_sql(j, 'b.fp')} IN (SELECT pos FROM bits)"
        for j in range(BLOOM_J)
    )
    return f"""
WITH hist AS (
  SELECT md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 2 = 0
),
batch AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
  WHERE doc_id % 2 = 1
),
bits AS (
  SELECT DISTINCT pos FROM ({union_bits})
),
probed AS (
  SELECT b.doc_id, b.fp,
         ({probe_all}) AS bloom_hit,
         h.fp IS NOT NULL AS exact_dup
  FROM batch b
  LEFT JOIN (SELECT DISTINCT fp FROM hist) h ON b.fp = h.fp
)
SELECT
  count(*)::BIGINT AS n_batch,
  sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END)::BIGINT AS n_suspected,
  sum(CASE WHEN exact_dup THEN 1 ELSE 0 END)::BIGINT AS n_true_dups,
  sum(CASE WHEN bloom_hit AND NOT exact_dup THEN 1 ELSE 0 END)::BIGINT
    AS n_false_positives,
  sum(CASE WHEN exact_dup AND NOT bloom_hit THEN 1 ELSE 0 END)::BIGINT
    AS n_false_negatives,
  round(sum(CASE WHEN bloom_hit AND NOT exact_dup THEN 1 ELSE 0 END)::DOUBLE
        / count(*), 6) AS fp_rate
FROM probed
"""


@query("dedup_incremental_bloom", oracle=_incr_bloom_oracle())
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup architecture: the HISTORY half of the
    corpus (even doc_ids) is folded into a Bloom filter over content
    fingerprints; the NEW batch (odd doc_ids) probes it, and bloom
    hits are exact-verified by an equi-join against history
    fingerprints. Emits the screen's confusion counts — suspected,
    true dups, false positives (the bits-per-key price, honestly
    measured), and false negatives (MUST be 0: Bloom filters have no
    false negatives; a nonzero here is a broken filter, pinned by the
    hash). This is how a production pipeline dedups a daily crawl drop
    against months of history WITHOUT joining the new batch to the
    full corpus: the filter ships to every executor (m bits, here
    4096 bits — the real system sizes m to the history
    cardinality), and only suspected rows pay the exact-verify join.

    Shares the salted-md5 bit positions with
    `sketch_bloom_membership`; at 100 TB the exact-verify side is a
    bucket-pruned lookup, not a full-history scan."""
    from ..operators.sketches import BLOOM_J, BLOOM_M, _bloom_pos_spark

    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    hist = d.where(F.col("doc_id") % 2 == 0).select(fp.alias("fp")).transform(
        track
    )  # bit build + exact-verify join
    batch = d.where(F.col("doc_id") % 2 == 1).select("doc_id", fp.alias("fp"))
    bits = (
        hist.select(
            F.explode(
                F.array(
                    *[_bloom_pos_spark(j, F.col("fp")) for j in range(BLOOM_J)]
                )
            ).alias("pos")
        )
        .distinct()
        .agg(F.collect_set("pos").alias("bitset"))
    )
    probe = None
    for j in range(BLOOM_J):
        hit_j = F.array_contains("bitset", _bloom_pos_spark(j, F.col("fp")))
        probe = hit_j if probe is None else (probe & hit_j)
    probed = (
        batch.crossJoin(F.broadcast(bits))
        .join(
            F.broadcast(hist.distinct().select(F.col("fp").alias("hfp"))),
            F.col("fp") == F.col("hfp"),
            "left",
        )
        .select(
            probe.alias("bloom_hit"),
            F.col("hfp").isNotNull().alias("exact_dup"),
        )
    )
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_batch"),
        F.sum(F.col("bloom_hit").cast("int")).cast("long").alias("n_suspected"),
        F.sum(F.col("exact_dup").cast("int")).cast("long").alias("n_true_dups"),
        F.sum((F.col("bloom_hit") & ~F.col("exact_dup")).cast("int"))
        .cast("long")
        .alias("n_false_positives"),
        F.sum((F.col("exact_dup") & ~F.col("bloom_hit")).cast("int"))
        .cast("long")
        .alias("n_false_negatives"),
        F.round(
            F.sum((F.col("bloom_hit") & ~F.col("exact_dup")).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


BBIT_B = 2  # stored bits per minhash value (Li & Koenig 2010)


def _bbit_oracle() -> str:
    mod = 1 << BBIT_B
    cb = 1.0 / mod
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents)
),
hashed AS (
  SELECT doc_id, {_BASEHASH_SQL} AS hs FROM t
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS_SQL}
  FROM hashed
),
banded AS (
  SELECT doc_id, [{", ".join(f"mh{k}" for k in range(N_MINHASH))}] AS sig,
       {_BAND_SQL}
  FROM sig
),
band_rows AS (
  SELECT doc_id, sig, 0 AS band_idx, band0 AS band_hash FROM banded
  UNION ALL SELECT doc_id, sig, 1, band1 FROM banded
  UNION ALL SELECT doc_id, sig, 2, band2 FROM banded
  UNION ALL SELECT doc_id, sig, 3, band3 FROM banded
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sa, b.sig AS sb
  FROM band_rows a JOIN band_rows b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(list_sum(list_transform(generate_series(1, {N_MINHASH}),
               i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END))
             / {N_MINHASH}.0, 6) AS est_full,
       round(greatest(
         (list_sum(list_transform(generate_series(1, {N_MINHASH}),
            i -> CASE WHEN sa[i] % {mod} = sb[i] % {mod} THEN 1 ELSE 0 END))
          / {N_MINHASH}.0 - {cb!r}) / {1.0 - cb!r}, 0.0), 6) AS est_bbit
FROM pairs
"""


@query("dedup_minhash_bbit", oracle=_bbit_oracle())
def dedup_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minwise hashing (Li & Koenig 2010): store only the lowest
    {BBIT_B} bits of each minhash value and debias the agreement rate
    by the collision floor — est = max((A - 1/2^b) / (1 - 1/2^b), 0).
    For the same LSH candidates this emits the full-width estimate and
    the {BBIT_B}-bit estimate side by side, which IS the storage
    trade: a {N_MINHASH}-perm signature shrinks from {N_MINHASH}x64
    bits to {N_MINHASH}x{BBIT_B} (a 32x index-memory cut at this
    geometry) while the debiased estimator stays unbiased — the
    variance price is visible in the per-pair spread between the two
    columns. At 100 TB the b-bit signatures are what actually ship to
    the dedup index; candidates still come from the full-width banded
    buckets (band hashes are md5s of full values, so candidate recall
    is unchanged).

    Plan: identical to `dedup_minhash_lsh` — signature build, band
    bucket equi-join, per-pair expression arithmetic; the b-bit fold
    is a zip_with over the signature arrays already in flight."""
    from ..api import _lsh_band_rows

    mod = 1 << BBIT_B
    cb = 1.0 / mod
    d = load_spread(spark, sf_dir, "documents")
    band_rows = _lsh_band_rows(
        d, "doc_id", "text", N_MINHASH, N_BANDS, SHINGLE, include_sig=True
    )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    agree_full = F.aggregate(
        F.zip_with(
            F.col("a.sig"), F.col("b.sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    agree_bbit = F.aggregate(
        F.zip_with(
            F.col("a.sig"), F.col("b.sig"),
            lambda x, y: F.when(x % mod == y % mod, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        # corpus x corpus candidate join: NEVER broadcast-eligible —
        # plan-time size estimates derive from the compressed file and
        # under-count exploded band/shingle relations by 100x+ (the r10
        # 1000x replica broadcast a 4 GB side and blew maxResultSize);
        # the hint pins a shuffle join regardless of estimates.
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(agree_full / float(N_MINHASH), 6).alias("est_full"),
            F.round(
                F.greatest(
                    (agree_bbit / float(N_MINHASH) - F.lit(cb))
                    / F.lit(1.0 - cb),
                    F.lit(0.0),
                ),
                6,
            ).alias("est_bbit"),
        )
        .distinct()
    )


# -- incremental near-dup: a persisted band-signature index probed by
#    the daily delta batch (the dedup twin of sim_ivf_incremental) --


def _incr_minhash_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL.strip()}) AS sh
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents)
),
hashed AS (
  SELECT doc_id, {_BASEHASH_SQL} AS hs FROM t
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS_SQL}
  FROM hashed
),
banded AS (
  SELECT doc_id, [{", ".join(f"mh{k}" for k in range(N_MINHASH))}] AS sig,
       {_BAND_SQL}
  FROM sig
),
band_rows AS (
  SELECT doc_id, sig, 0 AS band_idx, band0 AS band_hash FROM banded
  UNION ALL SELECT doc_id, sig, 1, band1 FROM banded
  UNION ALL SELECT doc_id, sig, 2, band2 FROM banded
  UNION ALL SELECT doc_id, sig, 3, band3 FROM banded
)
SELECT DISTINCT b.doc_id AS batch_doc, h.doc_id AS hist_doc,
       round(list_sum(list_transform(generate_series(1, {N_MINHASH}),
               i -> CASE WHEN b.sig[i] = h.sig[i] THEN 1 ELSE 0 END))
             / {N_MINHASH}.0, 6) AS est_jaccard
FROM (SELECT * FROM band_rows WHERE doc_id % 2 = 1) b
JOIN (SELECT * FROM band_rows WHERE doc_id % 2 = 0) h
  ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
"""


@query("dedup_incremental_minhash", oracle=_incr_minhash_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingest — the production shape for "dedup
    today's crawl drop against months of history" when exact
    fingerprints (`dedup_incremental_bloom`) are not enough: the
    HISTORY half of the corpus (even doc_ids) owns a PERSISTED
    banded-minhash signature table (staged to parquet once per
    fixture, content-addressed — the stored index a real pipeline
    maintains across days); the NEW batch (odd doc_ids) is shingled
    and minhashed ALONE and probes the stored bands with one
    (band_idx, band_hash) equi-join. Emits (batch_doc, hist_doc,
    est_jaccard) candidate pairs — the batch rows whose near-dup
    twin already exists in history.

    The point, visible in the plan: the history side is a parquet
    SCAN of stored signatures (no second shingle -> minhash pipeline
    anywhere — `tests/test_plans.py` pins exactly one stack() band
    expansion), so each daily run pays O(|batch|) hashing +
    an index probe, never a full-corpus re-shingle. At 100 TB the
    band table is additionally bucketed by band_hash so the probe
    shuffles only the batch side; after the probe the batch's own
    signatures are appended to the index (here the stage is
    immutable because the fixture is; `merge_into_parquet` is the
    append device the upsert family already ships).

    Candidate quality is identical to `dedup_minhash_lsh` — same 16
    md5-derived permutations, 4 bands of 4 — so the estimated
    Jaccard column is directly comparable across the family."""
    import os

    from ..api import _lsh_band_rows
    from ..operators.graph import _STAGE_ROOT, _source_fingerprint, _stage

    d = load_spread(spark, sf_dir, "documents")
    key = _source_fingerprint(sf_dir, ("documents",))
    hist = _stage(
        spark,
        os.path.join(_STAGE_ROOT, f"minhash_index_{key}"),
        lambda: _lsh_band_rows(
            d.where(F.col("doc_id") % 2 == 0),
            "doc_id",
            "text",
            N_MINHASH,
            N_BANDS,
            SHINGLE,
            include_sig=True,
        ),
    )
    batch = _lsh_band_rows(
        d.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        N_MINHASH,
        N_BANDS,
        SHINGLE,
        include_sig=True,
    )
    agreement = F.aggregate(
        F.zip_with(
            F.col("b.sig"), F.col("h.sig"), lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        # batch x index probe: the stored-signature side's plan-time
        # size estimate derives from the staged parquet and is honest,
        # but the batch side is a fresh shingle explosion the
        # estimator under-counts 100x+ (same lesson as
        # minhash_lsh_pairs) — pin a shuffle join.
        batch.alias("b")
        .hint("shuffle_hash")
        .join(
            hist.alias("h"),
            (F.col("b.band_idx") == F.col("h.band_idx"))
            & (F.col("b.band_hash") == F.col("h.band_hash")),
        )
        .select(
            F.col("b.doc_id").alias("batch_doc"),
            F.col("h.doc_id").alias("hist_doc"),
            F.round(agreement / float(N_MINHASH), 6).alias("est_jaccard"),
        )
        .distinct()
    )
