"""Similarity search over embedding columns (north star, SURVEY §2B).

Two paths, mirroring how a 100 TB vector corpus is actually served:

  * brute-force — exact top-k cosine: broadcast the (small) query set
    against the corpus, score with a codegen'd fold over the array,
    keep top-k per query with one window. Linear in corpus size, no
    shuffle of the corpus itself: the baseline and the recall oracle.
  * LSH ANN     — random-hyperplane signatures bucket the corpus; only
    same-bucket candidates get exact scoring. The bucket join replaces
    the cross product, making cost ~ bucket occupancy. Hyperplanes are
    md5-derived constants, so the DuckDB oracle computes the identical
    buckets (MLlib's BucketedRandomProjectionLSH is the same algorithm
    with an opaque seed).

Dot products fold left-to-right over doubles in both engines ->
bit-identical scores (rounded only to absorb final-ulp risk).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load_spread
from ..registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8
DIM = 64


def plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: md5-seeded so
    the engine and the oracle embed the same constants."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col: str) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm(v: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


@query(
    "sim_bruteforce_topk",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
),
q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM n WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 8) AS cosine
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, cosine FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {TOP_K}
""",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector. The query
    side is broadcast, so the corpus streams through one scoring stage
    and a single top-k window — the shape that scales to a sharded
    corpus (score locally, take per-shard top-k, merge)."""
    from ..api import topk_cosine

    e = load_spread(spark, sf_dir, "embeddings")
    return topk_cosine(
        corpus=e.filter(F.col("vec_id") >= N_QUERIES),
        queries=e.filter(F.col("vec_id") < N_QUERIES),
        id_col="vec_id",
        vec_col="embedding",
        k=TOP_K,
    )


def _planes_sql() -> str:
    rows = plane_weights()
    return ", ".join(
        "[" + ", ".join(f"{x:.3f}" for x in row) + "]" for row in rows
    )


def _bucket_sql(vexpr: str) -> str:
    rows = plane_weights()
    bits = []
    for row in rows:
        lit = "[" + ", ".join(f"{x:.3f}" for x in row) + "]"
        bits.append(f"CASE WHEN list_dot_product({vexpr}, {lit}) > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def _bucket_spark(v: F.Column) -> F.Column:
    parts = []
    for row in plane_weights():
        lit = F.array(*[F.lit(x) for x in row])
        parts.append(F.when(_dot(v, lit) > 0, "1").otherwise("0"))
    return F.concat(*parts)


#: ANN bucket width: 4 planes = 16 buckets. The width RULE (measured,
#: SCALING.md "ANN recall at 10x"): bits ~ log2(corpus / target
#: bucket size). Round 4 ran 8 bits (256 buckets) over a 2k-vector
#: corpus — ~8 vectors per bucket and a measured recall@3 of 0.03;
#: right-sizing to 16 buckets (~125 vectors each) plus Hamming-1
#: multi-probe lifts measured recall@3 to 0.57 at sf0.1 while still
#: rescoring <4% of the corpus per query (the remaining gap is the
#: synthetic embeddings' weak neighbor structure — true top-3 cosines
#: are low, where sign-LSH carries little signal; the exact
#: brute-force twin stays the recall oracle).
ANN_PLANES = 4


def _ann_bit_sql(vexpr: str, row: list[float], invert: bool) -> str:
    lit = "[" + ", ".join(f"{x:.3f}" for x in row) + "]"
    one, zero = ("'0'", "'1'") if invert else ("'1'", "'0'")
    return f"CASE WHEN list_dot_product({vexpr}, {lit}) > 0 THEN {one} ELSE {zero} END"


def _ann_probe_sql(vexpr: str, flip: int | None) -> str:
    """4-bit bucket string with (optionally) one plane's bit flipped —
    the Hamming-1 probe set spelled identically on both engines."""
    rows = plane_weights(ANN_PLANES)
    return " || ".join(
        _ann_bit_sql(vexpr, row, invert=(j == flip)) for j, row in enumerate(rows)
    )


def _ann_bit_spark(v: F.Column, row: list[float]) -> F.Column:
    lit = F.array(*[F.lit(x) for x in row])
    return F.when(_dot(v, lit) > 0, "1").otherwise("0")


def _ann_probes_from_bits(bits: list[F.Column]) -> F.Column:
    """Array of the bucket plus its ANN_PLANES Hamming-1 flips
    (multi-probe: a near neighbor on the wrong side of ONE hyperplane
    is still found), built from ALREADY-COMPUTED sign-bit columns.
    Recomputing the hyperplane dot inside every probe variant made the
    expression tree 5x larger and pushed plan+codegen compile time to
    ~2 s per run — the flip is a 1-char CASE on the stored bit, so the
    dot products appear exactly once in the plan."""
    def flipped(b: F.Column) -> F.Column:
        return F.when(b == "1", "0").otherwise("1")

    probes = [F.concat(*bits)]
    for i in range(len(bits)):
        probes.append(
            F.concat(*[flipped(b) if j == i else b for j, b in enumerate(bits)])
        )
    return F.array(*probes)


_ANN_PROBE_UNION = "\n  UNION ALL ".join(
    f"SELECT vec_id, v, nrm, {_ann_probe_sql('v', flip)} AS bucket FROM q"
    for flip in [None, *range(ANN_PLANES)]
)


@query(
    "sim_lsh_ann",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         {_ann_probe_sql('v', None)} AS bucket
  FROM e
),
q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM n WHERE vec_id >= {N_QUERIES}),
probes AS (
  {_ANN_PROBE_UNION}
),
scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 8) AS cosine
  FROM probes p JOIN c ON p.bucket = c.bucket
)
SELECT query_id, neighbor_id, cosine FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= 3
""",
)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors: 4-bit random-hyperplane LSH with
    Hamming-1 multi-probe (each query probes its own bucket plus the 4
    one-bit-flip buckets) + exact rescoring of the candidates, top-3
    per query. The equi-join on bucket is the whole trick — at 100 TB
    the corpus shuffles once by bucket and each query probes 5 of the
    16 cells instead of scanning the full corpus; bucket width follows
    bits ~ log2(corpus/bucket-size) (see ANN_PLANES for the measured
    recall cliff the round-4 8-bit width sat on)."""
    e = load_spread(spark, sf_dir, "embeddings")
    # The signature stage (interpreted-HOF dot products per row) feeds
    # both join sides; Catalyst won't reuse the common subtree across a
    # self-join, so persist it — compute signatures once, as a real
    # index build would. Each sign bit is materialized as its own
    # column so the probe variants reference it instead of re-deriving
    # the hyperplane dot (see _ann_probes_from_bits).
    rows = plane_weights(ANN_PLANES)
    n = (
        e.select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .select(
            "*", *[_ann_bit_spark(F.col("v"), r).alias(f"b{k}") for k, r in enumerate(rows)]
        )
        .transform(track)
    )
    bits = [F.col(f"b{k}") for k in range(ANN_PLANES)]
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.explode(_ann_probes_from_bits(bits)).alias("bucket"),
    )
    c = n.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        "v",
        "nrm",
        F.concat(*bits).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


@query(
    "sim_label_centroid",
    oracle="""
WITH dims AS (
  SELECT label, u.d, u.x
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d,
                       unnest(list_transform(embedding, e -> e::DOUBLE)) AS x) u
),
cent AS (
  SELECT label, d, CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
  FROM dims GROUP BY label, d
)
SELECT label, count(*)::BIGINT AS dim, round(sum(c * c), 8) AS centroid_sqnorm
FROM cent GROUP BY label
""",
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (the IVF coarse-quantizer build step):
    explode to (label, dim, value), average per cell, reduce to a
    verifiable squared-norm per centroid."""
    e = load_spread(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode(_as_double("embedding")).alias("d0", "x")
    ).select("label", (F.col("d0") + 1).alias("d"), "x")
    cent = dims.groupBy("label", "d").agg(
        (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias(
            "c"
        )
    )
    return cent.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.sum(F.col("c") * F.col("c")), 8).alias("centroid_sqnorm"),
    )


N_PROBE = 2  # centroid cells probed per query


def _cell_sim():
    # centroid/query cosine used by assignment and probing — shared so
    # the staged layout probes with the EXACT expression the build used
    return _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))


def _ivf_base(spark: SparkSession, sf_dir: str, train_filter=None):
    """Norm table + per-label coarse centroids, both persisted — the
    shared build inputs of every IVF tier and of the staged on-disk
    layout. ``train_filter`` (optional Column) restricts the rows the
    QUANTIZER is trained on without touching the norm table — the
    frozen-quantizer device `sim_ivf_incremental` rides.

    r14 optimization (guide §2.3/§2.4): the centroid build used to
    posexplode every training vector into DIM rows and aggregate twice
    (label,d then label) — TWO keyed exchanges with a DIMx row
    explosion through the first. DECIMAL sums are exact (order-free),
    so the same per-dim means fall out of ONE groupBy(label) carrying
    DIM decimal-sum buffers, map-side combined: one exchange, one row
    per label crossing it, bit-identical values (the oracle keeps its
    LATERAL-unnest spelling and still hash-matches). The quantizer is
    consumed exactly once per invocation (collected by
    ``_quantizer_rows`` or staged to parquet), so it is no longer
    persisted."""
    e = load_spread(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "label", _as_double("embedding").alias("v"))
    train = base.filter(train_filter) if train_filter is not None else base
    dims = range(1, DIM + 1)
    sums_sql = (
        "named_struct('n', count(1), "
        + ", ".join(
            f"'s{d}', sum(cast(element_at(v, {d}) as decimal(28,12)))" for d in dims
        )
        + ")"
    )
    cv_sql = (
        "array("
        + ", ".join(f"(cast(_a.s{d} as double) / _a.n)" for d in dims)
        + ") AS cv"
    )
    cent = (
        train.groupBy("label")
        .agg(F.expr(sums_sql).alias("_a"))
        .selectExpr("label AS cell", cv_sql)
    )
    n = (
        base.select("vec_id", "v")
        .withColumn("nrm", _norm(F.col("v")))
        .transform(track)
    )
    cent_n = cent.withColumn("cnrm", _norm(F.col("cv")))
    return n, cent_n


def _quantizer_rows(cent_n: DataFrame) -> list[tuple[int, list[float], float]]:
    """Collect the coarse quantizer: ONE row per cell, bounded by the
    CELL DOMAIN (the label space) — never corpus- or request-scaled
    (the bounded control-plane collect the probed-cell lists already
    ride). A production IVF serves the quantizer from RAM on every
    node — it IS the broadcast object (FAISS keeps the coarse
    centroids in the index header) — so assignment and probing become
    pure per-row expressions over the scan instead of joins +
    aggregates: the corpus is never expanded, shuffled, or re-joined
    to pick its cell. Doubles round-trip exactly (JVM -> collect ->
    literal), so every downstream score is bit-identical."""
    rows = sorted(
        (r["cell"], [float(x) for x in r["cv"]], float(r["cnrm"]))
        for r in cent_n.select("cell", "cv", "cnrm").collect()
    )
    for c, cv, _ in rows:
        # r14 ADVICE #2: the literal devices assume the DENSE
        # fixed-DIM embedding contract (element_at(v, d) per dim,
        # count(1) as the per-dim divisor). A ragged or truncated
        # embedding column would silently drift from the oracle —
        # fail loudly at the control-plane boundary instead.
        if len(cv) != DIM:
            raise ValueError(
                f"quantizer cell {c} has {len(cv)} dims, expected DIM={DIM}: "
                "embeddings must be dense fixed-width vectors"
            )
    return rows


#: Guard for every literal-centroid device (_assign_cell_sql,
#: _probe_cells_sql, _argmin_d2_sql): max DOUBLE literals inlined per
#: generated expression. Past this, Catalyst tree size and the Janino
#: 64 KB method-body limit make the literal spelling a liability
#: (interpreted fallback + planning blowup), so callers must keep (or
#: fall back to) the broadcast/hash_argmin path — r14 ADVICE #4.
#: 4096 ≈ 64 cells x DIM, well inside the measured-safe envelope of
#: the r14 plans (20 cells x 64 dims) with 3x headroom.
LITERAL_ARGMIN_MAX_DOUBLES = 4096


def _vec_sql(xs: list[float]) -> str:
    return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"


def _dot_lit_sql(vexpr: str, xs: list[float]) -> str:
    """SQL spelling of ``_dot`` against a literal vector — the same
    zip_with/aggregate fold, so the arithmetic is bit-identical."""
    return (
        f"aggregate(zip_with({vexpr}, {_vec_sql(xs)}, (x, y) -> x * y), "
        "0D, (acc, x) -> acc + x)"
    )


def _cell_struct_sql(qrows, vexpr: str, nrmexpr: str) -> str:
    """Comma-joined (sim, -cell) structs, one per quantizer cell: max
    by sim then max by -cell == the oracle's (sim DESC, cell ASC)
    row_number tie-break."""
    if not qrows:
        # r14 ADVICE #3: an empty quantizer (e.g. a train_filter that
        # matched no rows) used to surface as an opaque SQL parse
        # error from the empty greatest()/array() expression.
        raise ValueError(
            "empty quantizer: the centroid relation produced no cells"
        )
    n_doubles = len(qrows) * (len(qrows[0][1]) + 1)
    if n_doubles > LITERAL_ARGMIN_MAX_DOUBLES:
        # r14 ADVICE #4: the literal device scales as n_cells x DIM
        # inlined literals; past the codegen-safe budget callers must
        # use the broadcast/hash_argmin path (the PQ codebooks do).
        raise ValueError(
            f"quantizer too large to literalize: {len(qrows)} cells x "
            f"{len(qrows[0][1])} dims = {n_doubles} doubles > "
            f"{LITERAL_ARGMIN_MAX_DOUBLES}; use the hash_argmin path"
        )
    return ",".join(
        f"named_struct('s', ({_dot_lit_sql(vexpr, cv)} / ({nrmexpr} * {cn!r}D)),"
        f" 'nc', {-c})"
        for c, cv, cn in qrows
    )


def _assign_cell_sql(qrows, vexpr: str = "v", nrmexpr: str = "nrm") -> str:
    """Nearest-cell id as one scalar expression (argmax sim, ties to
    the smallest cell) — the per-row replacement for the two-pass
    hash_argmin when the candidate relation is literal-sized."""
    if len(qrows) == 1:
        return str(qrows[0][0])
    return f"(-greatest({_cell_struct_sql(qrows, vexpr, nrmexpr)}).nc)"


def _probe_cells_sql(
    qrows, n_probe: int = N_PROBE, vexpr: str = "v", nrmexpr: str = "nrm"
) -> str:
    """Top-``n_probe`` cell ids as one array expression (sim DESC,
    cell ASC — reverse of an ascending (sim, -cell) sort)."""
    return (
        f"transform(slice(reverse(array_sort(array("
        f"{_cell_struct_sql(qrows, vexpr, nrmexpr)}))), 1, {n_probe}), t -> -t.nc)"
    )


def _ivf_probes(queries: DataFrame, cent_n: DataFrame, qrows=None) -> DataFrame:
    """Each query's top-{N_PROBE} cells, WITH the query vector/norm
    alongside: (query_id, qv, qnrm, cell). ``queries`` is
    (vec_id, v, nrm).

    r14 optimization: was a crossJoin against the broadcast centroid
    relation plus a row_number window (an exchange of the expanded
    requests x cells relation). The quantizer is cell-domain-sized, so
    probing is now a single projection — the top-{N_PROBE} cells fall
    out of one array expression over the literal centroids, and the
    query vector rides along so consumers stop re-joining it."""
    if qrows is None:
        qrows = _quantizer_rows(cent_n)
    return queries.selectExpr(
        "vec_id AS query_id",
        "v AS qv",
        "nrm AS qnrm",
        f"explode({_probe_cells_sql(qrows)}) AS cell",
    )


def _ivf_parts(spark: SparkSession, sf_dir: str):
    """Shared IVF front-end for sim_ivf_ann and sim_ivf_pq: per-label
    coarse centroids (explode -> per-dim DECIMAL-exact mean ->
    rebuild), the persisted norm table, the corpus-to-cell assignment,
    and each query's {N_PROBE} probe cells. Returns ``(n, assign,
    probes)``. n feeds four branches (corpus assignment, query
    probing, and both rescore sides) and cent_n two; both persist so
    the norm/centroid pipelines run once — the quantizer and the
    vector index are build-once artifacts in a real IVF deployment
    (``sim_ivf_staged`` demonstrates exactly that deployment shape)."""
    n, cent_n = _ivf_base(spark, sf_dir)
    # corpus side: nearest cell as ONE scalar expression over the
    # literal quantizer (r14, guide §8 "decide with small rows"): the
    # corpus streams through a single projection — no expansion join,
    # no aggregate, no exchange — and carries (v, nrm) along so
    # consumers rescore without re-joining the norm table. The
    # two-pass hash_argmin remains the device for candidate relations
    # too big to literalize (the PQ codebooks).
    qrows = _quantizer_rows(cent_n)
    assign = n.filter(F.col("vec_id") >= N_QUERIES).selectExpr(
        "vec_id", "v", "nrm", f"{_assign_cell_sql(qrows)} AS cell"
    )
    probes = _ivf_probes(n.filter(F.col("vec_id") < N_QUERIES), cent_n, qrows)
    return n, assign, probes


#: The IVF front-end spelled ONCE for every oracle that rides it
#: (sim_ivf_ann and the sq8 / true-PQ rescore family) — the SQL twin
#: of ``_ivf_parts``: per-label coarse centroids, the norm table, the
#: corpus->cell assignment, and each query's probe cells. Shared so
#: the five oracles cannot silently drift apart (round-6 advice).
_IVF_CTES = f"""
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
dims AS (
  SELECT label, u.d, u.x
  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d,
                          unnest(v) AS x) u
),
cent AS (
  SELECT label AS cell, list(c ORDER BY d) AS cv
  FROM (SELECT label, d,
               CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        FROM dims GROUP BY label, d)
  GROUP BY label
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, cent.cv)
                      / (n.nrm * sqrt(list_sum(list_transform(cent.cv, x -> x*x))))
                      DESC, cent.cell) AS rn
    FROM n CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, cent.cv)
                      / (n.nrm * sqrt(list_sum(list_transform(cent.cv, x -> x*x))))
                      DESC, cent.cell) AS rn
    FROM n CROSS JOIN cent WHERE n.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
)"""


@query(
    "sim_ivf_ann",
    oracle="WITH " + _IVF_CTES + f"""
SELECT query_id, neighbor_id, cosine FROM (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) AS cosine,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) DESC,
                    a.vec_id) AS rn
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id >= {N_QUERIES}
  JOIN n qn  ON qn.vec_id = p.vec_id
  JOIN n cn_ ON cn_.vec_id = a.vec_id
) WHERE rn <= 3
""",
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: data-derived coarse quantizer (per-label centroid
    = the kmeans-lite cell), corpus vectors assigned to their nearest
    cell, queries probe their {N_PROBE} nearest cells, exact cosine
    rescoring only within probed cells.

    The 100 TB shape (r14): centroids are cell-domain-sized and served
    as literals (the quantizer every IVF node keeps in RAM), so the
    corpus is NEVER shuffled at all — one projection assigns each
    vector its cell and carries (v, nrm), the request-sized probe rows
    broadcast onto it, and the only exchange anywhere carries
    (query_id, neighbor_id, cosine) candidate rows into the top-k
    window. Previously the corpus crossed a two-pass argmin plus a
    re-join against the norm table (guide §8: decide with small rows,
    move big rows never). sim_bruteforce_topk is the recall oracle."""
    _, assign, probes = _ivf_parts(spark, sf_dir)
    cand = assign.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


def ivf_staged_layout(spark: SparkSession, sf_dir: str):
    """The PERSISTED IVF index the sim_ivf_ann docstring promises:
    the encoded corpus (vec_id, v, nrm) staged ONCE per fixture,
    directory-partitioned by its coarse cell id, plus the coarse
    centroids staged as a tiny sibling artifact. A probe that filters
    ``cell IN (probed cells)`` partition-prunes the file source to
    the probed cells' directories (`PartitionFilters`, pinned by
    tests/test_plans.py::test_ivf_staged_scan_prunes_to_probed_cells)
    — each query reads ~n_probe/n_cells of the corpus FROM DISK, not
    just post-scan. At 100 TB this is the deployment shape: build the
    quantizer and the partitioned index once, serve probes against
    the layout (the `ppr_edges_bucketed` discipline applied to the
    vector index). Returns ``(corpus, cent_n)`` readers."""
    from ..operators.graph import (
        _STAGE_ROOT,
        _source_fingerprint,
        _stage,
        _stage_partitioned,
    )

    key = _source_fingerprint(sf_dir, ("embeddings",))

    def build_corpus() -> DataFrame:
        # assign already carries (v, nrm) alongside the cell id (r14)
        _, assign, _ = _ivf_parts(spark, sf_dir)
        return assign.select("vec_id", "v", "nrm", "cell")

    def build_cent() -> DataFrame:
        return _ivf_base(spark, sf_dir)[1]

    corp = _stage_partitioned(
        spark, os.path.join(_STAGE_ROOT, f"ivf_corpus_{key}"), build_corpus, "cell"
    )
    cent_n = _stage(spark, os.path.join(_STAGE_ROOT, f"ivf_cent_{key}"), build_cent)
    return corp, cent_n


def ivf_staged_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Just the staged coarse-centroid artifact of `ivf_staged_layout`
    (same path, same build — callers that serve a different index body
    over the same coarse quantizer, e.g. the staged-PQ layout, reuse
    it without also staging the full-precision corpus)."""
    from ..operators.graph import _STAGE_ROOT, _source_fingerprint, _stage

    key = _source_fingerprint(sf_dir, ("embeddings",))

    def build_cent() -> DataFrame:
        return _ivf_base(spark, sf_dir)[1]

    return _stage(spark, os.path.join(_STAGE_ROOT, f"ivf_cent_{key}"), build_cent)


@query(
    "sim_ivf_staged",
    oracle="WITH " + _IVF_CTES + f"""
SELECT query_id, neighbor_id, cosine FROM (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) AS cosine,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) DESC,
                    a.vec_id) AS rn
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id >= {N_QUERIES}
  JOIN n qn  ON qn.vec_id = p.vec_id
  JOIN n cn_ ON cn_.vec_id = a.vec_id
) WHERE rn <= 3
""",
)
def sim_ivf_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_ivf_ann served from the PERSISTED partition-by-cell index
    (`ivf_staged_layout`) instead of an in-query corpus shuffle: the
    probe set's cells are collected (bounded by the CELL DOMAIN —
    ~#labels values, never corpus- or request-scaled), the staged
    corpus scan partition-prunes to exactly those directories, and
    the request-sized (query, cell, vector) relation broadcasts onto
    the pruned scan for exact cosine rescoring. Same candidates, same
    tie-break, hash-identical to sim_ivf_ann's oracle — the 100 TB
    claim in sim_ivf_ann's docstring ('a write-time layout in
    practice') as tested code. Quantizer artifacts round-trip through
    parquet doubles, which is exact, so probes and scores match the
    in-query build bit-for-bit."""
    corp, cent_n = ivf_staged_layout(spark, sf_dir)
    e = load_spread(spark, sf_dir, "embeddings")
    qn0 = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .transform(track)  # probe window + rescore both read it
    )
    probes = _ivf_probes(qn0, cent_n)  # carries (qv, qnrm) alongside
    # bounded collect: distinct probed cell ids, <= the cell domain
    cells = [r[0] for r in probes.select("cell").distinct().collect()]
    cand = (
        corp.where(F.col("cell").isin(cells))  # partition-pruned scan
        .join(F.broadcast(probes), "cell")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------- SQ8 family
#: int8 scalar-quantized corpus codes: q_i = round(x_i * 127 / max|x|)
#: per vector (the scheme embed_normalize_quantize emits).
_SQ8_QUANT_CTE = f"""
quant AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(x * 127 / nullif(mx, 0)) AS TINYINT))
           AS qi,
         mx / 127 AS scale
  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
        FROM e WHERE vec_id >= {N_QUERIES})
)"""

#: probe candidates scored by the int8 asymmetric dot, ranked per
#: query — the block sim_ivf_sq8 cuts at rn<=3 and sim_ivf_sq8_rerank
#: cuts at rn<={PQ_RERANK_R} (one spelling, two consumers).
_SQ8_SCORED_SELECT = f"""
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(qz.scale *
               list_sum(list_transform(list_zip(qn.v, qz.qi), t -> t[1] * t[2]))
               / (qn.nrm * cn_.nrm), 8) AS approx_cosine,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY round(qz.scale *
                    list_sum(list_transform(list_zip(qn.v, qz.qi), t -> t[1] * t[2]))
                    / (qn.nrm * cn_.nrm), 8) DESC,
                    a.vec_id) AS rn
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id >= {N_QUERIES}
  JOIN n qn  ON qn.vec_id = p.vec_id
  JOIN n cn_ ON cn_.vec_id = a.vec_id
  JOIN quant qz ON qz.vec_id = a.vec_id
"""


def _sq8_scored(spark: SparkSession, sf_dir: str):
    """Shared int8 (SQ8) scoring stage under sim_ivf_sq8 and
    sim_ivf_sq8_rerank (one spelling — round-6 advice flagged the
    copy-paste twins): IVF front-end from ``_ivf_parts``, corpus
    quantized to per-vector int8 codes + one fp scale + exact norm,
    probe candidates scored with the asymmetric quantized dot (query
    stays full-precision). Returns ``(n, qn, cand)`` where ``cand``
    is (query_id, neighbor_id, approx_cosine), unranked."""
    n, assign, probes = _ivf_parts(spark, sf_dir)
    qn = n.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # r14: the int8 codes are a per-row function of the vector the
    # assignment projection already carries — computing them THERE
    # removes the corpus-sized quant join (the index row stores its
    # codes next to its cell id, exactly the on-disk layout).
    mx = F.array_max(F.transform("v", F.abs))
    quant = assign.withColumn("mx", mx).select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        F.transform(
            "v",
            lambda x: F.round(x * 127 / F.nullif(F.col("mx"), F.lit(0.0))).cast(
                "tinyint"
            ),
        ).alias("qi"),
        (F.col("mx") / 127).alias("scale"),
        "nrm",
    )
    approx = F.round(
        F.col("scale")
        * F.aggregate(
            F.zip_with(F.col("qv"), F.col("qi"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("qnrm") * F.col("nrm")),
        8,
    )
    cand = quant.join(F.broadcast(probes), "cell").select(
        "query_id", "neighbor_id", approx.alias("approx_cosine")
    )
    return n, qn, cand


@query(
    "sim_ivf_sq8",
    oracle="WITH " + _IVF_CTES + "," + _SQ8_QUANT_CTE + f"""
SELECT query_id, neighbor_id, approx_cosine FROM (
{_SQ8_SCORED_SELECT}) WHERE rn <= 3
""",
)
def sim_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + int8 scalar-quantization (SQ8) rescoring — renamed from
    ``sim_ivf_pq`` in round 7: this operator is per-vector SCALAR
    quantization (one int8 code per dimension + one fp scale), a 4x
    index reduction; true PRODUCT quantization with per-subspace
    codebooks and ADC lookup is ``sim_ivf_truepq`` below. Identical
    coarse quantizer, assignment and probing as sim_ivf_ann (shared
    ``_ivf_parts``), but the probed cells are rescored against the
    int8 codes while the query stays full-precision — the standard
    asymmetric arrangement that cuts index memory/bandwidth 4x at
    100 TB. Exact per-vector L2 norms ride alongside the codes
    (8 bytes against a 4x-reduced vector — standard practice), so the
    only approximation is the quantized dot product; measured recall@3
    vs the exact top-3 is recorded in SCALING.md via
    tools/measure_ann_recall.py.

    Cross-engine determinism: quantized codes are integers (exactly
    reproduced by both engines' HALF_UP round — the green
    embed_normalize_quantize precedent), the dot is a sequential
    double fold on both sides, and ranking rounds to 8 decimals with
    vec_id tie-break."""
    _, _, cand = _sq8_scored(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "approx_cosine")
    )


PQ_RERANK_R = 6  # quantized shortlist size re-ranked at full precision


@query(
    "sim_ivf_sq8_rerank",
    oracle="WITH " + _IVF_CTES + "," + _SQ8_QUANT_CTE + f""",
shortlist AS (
  SELECT query_id, neighbor_id FROM (
{_SQ8_SCORED_SELECT}) WHERE rn <= {PQ_RERANK_R}
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) AS cosine,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) DESC,
                    s.neighbor_id) AS rn
  FROM shortlist s
  JOIN n qn  ON qn.vec_id = s.query_id
  JOIN n cn_ ON cn_.vec_id = s.neighbor_id
) WHERE rn <= 3
""",
)
def sim_ivf_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval over the int8 IVF index (renamed from
    ``sim_ivf_pq_rerank`` in round 7 alongside sim_ivf_sq8) — the
    production architecture a memory-bounded 100 TB vector store
    actually runs: stage 1 shortlists the top-{PQ_RERANK_R} per query
    by the int8 asymmetric score (4x less index traffic, same probe
    geometry as sim_ivf_ann/sim_ivf_sq8), stage 2 re-ranks ONLY the
    shortlist against the full-precision vectors (one
    {PQ_RERANK_R}-rows-per-query join) and emits exact-cosine top-3.
    Any pair the int8 score orders wrongly inside the shortlist is
    corrected, so the result converges to sim_ivf_ann's as R grows,
    while the fp vectors are touched for R rows per query instead of
    the whole probe set."""
    n, qn, cand = _sq8_scored(spark, sf_dir)
    w1 = W.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= PQ_RERANK_R)
        .select("query_id", "neighbor_id")
    )
    cn_ = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm")
    exact = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.join(F.broadcast(qn), "query_id")
        .join(cn_, "neighbor_id")
        .select("query_id", "neighbor_id", exact.alias("cosine"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


# ------------------------------------------------------------ true-PQ family
#: Product-quantization geometry — the standard "PQ8" arrangement for
#: d=64 (Jegou et al. 2011 §V uses m=8 for d<=128; FAISS's default
#: PQ8x8 is the same): DIM=64 splits into PQ_M=8 subspaces of
#: PQ_SUBDIM=8 dims; each subspace trains a PQ_K=256-codeword codebook
#: (PQ_ITERS deterministic Lloyd rounds, seeded by the first PQ_K
#: corpus subvectors — at an SF whose corpus is smaller than PQ_K the
#: codebook simply has fewer codewords, identically on both engines).
#: A corpus vector is then 8 codes x 8 bits = 8 BYTES against 256 fp
#: bytes — the 32x (vs int8's 4x) reduction a genuinely memory-bound
#: 100 TB index runs. Geometry chosen by a measured sweep (SCALING.md
#: round-7 PQ table): coarser grids (4x16, 8x64) leave ADC recall at
#: 0.07-0.23 on this corpus's weak neighbor structure; 8x256 scores
#: 0.367 vs the 0.433 IVF-exact ceiling at sf0.01 and the fp rerank
#: recovers the ceiling exactly.
PQ_M = 8
PQ_SUBDIM = DIM // PQ_M
PQ_K = 256
PQ_ITERS = 2
#: Codebooks train on a DETERMINISTIC BOUNDED SAMPLE — the first
#: PQ_TRAIN_SAMPLE corpus vectors — and only the single encode pass
#: touches the whole corpus. This is how every production PQ build
#: works (FAISS trains on ~100k-1M sampled vectors regardless of index
#: size): it makes training cost CONSTANT in corpus size instead of
#: corpus x PQ_K per Lloyd round. At the driver SFs the corpus
#: (<=2000) fits inside the sample, so the bound is exercised only on
#: the scale replicas (SCALING.md measures the slope flattening).
PQ_TRAIN_SAMPLE = 2048


def _pq_subvectors(df: DataFrame) -> DataFrame:
    """(vec_id, v) -> (vec_id, sub, sv): each vector exploded into its
    PQ_M contiguous subvectors, inside codegen (array slice, no
    shuffle)."""
    structs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.slice("v", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
            )
            for s in range(PQ_M)
        ]
    )
    return df.select("vec_id", F.explode(structs).alias("t")).select(
        "vec_id", "t.sub", "t.sv"
    )


def _pq_d2() -> F.Column:
    """Squared distance between the sv/cv subvector columns, spelled
    as PQ_SUBDIM inline element_at terms instead of a zip_with fold:
    bit-identical arithmetic (a left-associated sum of non-negative
    squares; the fold's 0.0 seed adds exactly nothing), but the whole
    expression stays inside whole-stage codegen — the interpreted HOF
    fold evaluated corpus x PQ_K times was ~80% of the query's wall
    clock at PQ_K=256."""
    terms = []
    for i in range(1, PQ_SUBDIM + 1):
        dx = F.element_at(F.col("sv"), i) - F.element_at(F.col("cv"), i)
        terms.append(dx * dx)
    d2 = terms[0]
    for t in terms[1:]:
        d2 = d2 + t
    return d2


def _pq_d2_scalar() -> F.Column:
    """`_pq_d2` over the scalar-column spelling (sv1..svN / cv1..cvN):
    the same left-associated sum of squared differences over the same
    doubles — bit-identical values — but each operand is a flat double
    column instead of an array element_at, so the expanded
    (subvectors x codewords) relation pays no per-element null/bounds
    checks or array headers (r15, guide §2.3 'narrower types' applied
    to the argmin expansion — the expansion is the whole cost of PQ
    assignment)."""
    terms = []
    for i in range(1, PQ_SUBDIM + 1):
        dx = F.col(f"sv{i}") - F.col(f"cv{i}")
        terms.append(dx * dx)
    d2 = terms[0]
    for t in terms[1:]:
        d2 = d2 + t
    return d2


def _pq_scalar_sub(sub: DataFrame) -> DataFrame:
    """(vec_id, sub, sv[array]) -> (vec_id, sub, sv1..svN): the scalar
    spelling of the subvector relation (element_at of a dense
    fixed-width slice — identical doubles)."""
    return sub.select(
        "vec_id",
        "sub",
        *[
            F.element_at("sv", d).alias(f"sv{d}")
            for d in range(1, PQ_SUBDIM + 1)
        ],
    )


def _pq_scalar_cand(cent: DataFrame) -> DataFrame:
    """(sub, cell, cv[array]) -> (sub, cell, cv1..cvN) for the argmin
    expansion's build side."""
    return cent.selectExpr(
        "sub",
        "cell",
        *[f"element_at(cv, {d}) AS cv{d}" for d in range(1, PQ_SUBDIM + 1)],
    )


def hash_argmin(
    narrow: DataFrame,
    cand: DataFrame,
    expand_on,
    score: F.Column,
    keys: list[str],
    out: str = "cell",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed argmin over a broadcast candidate relation with
    (score asc, cell asc) tie-break, using ONLY hash aggregates — the
    r10 replacement for both min(struct(score, cell)) and per-key
    row_number windows.

    Why: min(STRUCT) is a DeclarativeAggregate with an immutable
    buffer type, so Catalyst falls back to SortAggregate, whose
    PARTIAL phase SORTS the whole expanded (narrow x candidates)
    relation inside each task — at the 1000x replica that sort
    spilled >60 GB and filled the disk (sim_ivf_truepq, r10). A
    row_number window has the same shape plus an exchange of the
    expanded relation. This helper never sorts and never shuffles
    anything expanded: pass 1 broadcasts `cand`, expands, and
    hash-aggregates min(score) per key (double buffer — map-side
    combine collapses the expansion before the exchange); pass 2
    re-expands with the per-key minimum joined on (a keyed join of
    two NARROW relations), keeps exact-equality winners (the score
    expression is recomputed bit-identically), and hash-aggregates
    min(cell) for the oracle's deterministic tie-break. Two codegen
    passes over the expansion instead of one sorted one — the classic
    two-pass argmin trade, and the only shape whose shuffle volume is
    one row per key at any scale.

    ``carry`` (r15, guide §2.4): extra ``narrow`` columns functionally
    dependent on ``keys`` (e.g. the subvector the key was derived
    from) ride the final hash aggregate as additional group keys, so
    consumers that need them do not pay a join back onto ``narrow``
    after the argmin."""
    def expand(df: DataFrame) -> DataFrame:
        j = (
            df.join(F.broadcast(cand), expand_on)
            if expand_on
            else df.crossJoin(F.broadcast(cand))
        )
        return j.withColumn("_sc", score)

    mins = expand(narrow).groupBy(*keys).agg(F.min("_sc").alias("_msc"))
    return (
        expand(narrow.join(mins, list(keys)))
        .filter(F.col("_sc") == F.col("_msc"))
        .groupBy(*keys, *carry)
        .agg(F.min("cell").alias(out))
    )


def _pq_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-codeword assignment per (vec_id, sub) -> (vec_id, sub,
    cell): broadcast the (PQ_M x PQ_K)-row codebook, argmin squared
    distance within the SAME subspace, ties on cell asc — the grouped
    twin of lloyd_assign's assignment step, via the two-pass
    hash_argmin (the r9 min(struct) spelling fell back to
    SortAggregate and sort-spilled corpus x PQ_K rows at the 1000x
    replica; see hash_argmin). Matches the oracle's row_number
    (d2 asc, cell asc) tie-break exactly; the corpus never shuffles
    expanded for assignment. r15: the expansion runs in the scalar
    spelling (see _pq_d2_scalar) — same doubles, same tie-break."""
    return hash_argmin(
        _pq_scalar_sub(sub),
        _pq_scalar_cand(cent),
        "sub",
        _pq_d2_scalar(),
        ["vec_id", "sub"],
    ).select("vec_id", "sub", "cell")


def _pq_codebook_local(spark: SparkSession, rows) -> DataFrame:
    """Bounded codebook rows -> a LocalRelation (sub, cell, cv). The
    codebook is the PQ index header (FAISS keeps it in RAM on every
    node); serving it as a local relation means downstream plans never
    re-walk the training lineage."""
    return spark.createDataFrame(
        [(int(s), int(c), list(cv)) for s, c, cv in rows],
        "sub int, cell int, cv array<double>",
    )


def _pq_lloyd_rows(items) -> list:
    """The PQ Lloyd rounds over the collected BOUNDED sample, run on
    the driver — ``items`` is [(vec_id, sub, sv list)], at most
    PQ_TRAIN_SAMPLE x PQ_M rows. Reproduces the relational spelling
    BIT-FOR-BIT (pinned by tests/test_llm.py's replica comparison and
    by every PQ oracle hash):

    * d2 is the left-associated float64 sum of squared differences —
      numpy is only used for vectorized elementwise ops; the
      cross-dimension accumulation is an explicit left-assoc loop, so
      each partial sum is the same IEEE double the codegen'd
      expression produces;
    * the argmin takes the FIRST minimum over codewords ordered by
      cell asc == the (d2 asc, cell asc) tie-break;
    * the update quantizes each member coordinate to DECIMAL(·,12)
      (HALF_UP via shortest-repr, exactly Spark's double->decimal
      cast), sums exactly, converts the sum to double
      (correctly-rounded, same as Decimal.toDouble), and divides by
      the member count in float64.
    """
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP

    q12 = Decimal("1E-12")
    by_sub: dict[int, list] = {}
    for vid, s, sv in items:
        by_sub.setdefault(int(s), []).append((int(vid), sv))
    cents: dict[int, list] = {}
    for s, members in by_sub.items():
        seed = sorted(
            (vid - N_QUERIES, [float(x) for x in sv])
            for vid, sv in members
            if vid < N_QUERIES + PQ_K
        )
        cents[s] = seed
    for _ in range(PQ_ITERS):
        new_cents: dict[int, list] = {}
        for s, members in by_sub.items():
            cl = cents[s]
            cells = np.array([c for c, _ in cl])
            bmat = np.array([cv for _, cv in cl], dtype=np.float64)
            vmat = np.array([sv for _, sv in members], dtype=np.float64)
            acc = (vmat[:, 0, None] - bmat[None, :, 0]) ** 2
            for d in range(1, PQ_SUBDIM):
                acc = acc + (vmat[:, d, None] - bmat[None, :, d]) ** 2
            assigned = cells[np.argmin(acc, axis=1)]
            groups: dict[int, list] = {}
            for (_, sv), c in zip(members, assigned):
                groups.setdefault(int(c), []).append(sv)
            out = []
            for c in sorted(groups):
                mem = groups[c]
                cv = []
                for d in range(PQ_SUBDIM):
                    ssum = sum(
                        (
                            Decimal(repr(float(sv[d]))).quantize(
                                q12, ROUND_HALF_UP
                            )
                            for sv in mem
                        ),
                        Decimal(0),
                    )
                    cv.append(float(ssum) / len(mem))
                out.append((c, cv))
            new_cents[s] = out
        cents = new_cents
    return sorted(
        (s, c, tuple(cv)) for s, cl in cents.items() for c, cv in cl
    )


def _pq_train(sub: DataFrame) -> DataFrame:
    """Per-subspace Lloyd's k-means over corpus subvectors,
    deterministic by the same construction as kmeans_train: seed = the
    first PQ_K corpus vectors' subvectors, ties on cell asc, means
    through DECIMAL. Returns the final codebook (sub, cell, cv) as a
    LOCAL relation.

    r15 (guide §1.2 step 1 — fix the distributed algorithm): PQ
    training is bounded by PQ_TRAIN_SAMPLE (the FAISS practice:
    codebooks train on a fixed sample regardless of index size, and
    the trained codebook IS the index header every node holds). The
    relational spelling paid 2 x PQ_ITERS broadcast-expand argmin
    passes plus per-round collect jobs over a relation of at most
    PQ_TRAIN_SAMPLE x PQ_M rows — pure fixed overhead at every SF,
    measured ~5 s of the query's 11.4 s wall at sf0.1. Now: ONE
    bounded control-plane collect of the sample (~1 MB), the Lloyd
    rounds run driver-side with bit-identical arithmetic
    (_pq_lloyd_rows — pinned by a replica test and the oracle
    hashes), and the codebook is re-served as a local relation.
    Corpus-scaled work (the full-corpus encode) stays distributed —
    only the sample and the index header ever touch the driver."""
    spark = sub.sparkSession
    raw = sub.select("vec_id", "sub", "sv").collect()
    rows = _pq_lloyd_rows(
        [(r["vec_id"], r["sub"], [float(x) for x in r["sv"]]) for r in raw]
    )
    return _pq_codebook_local(spark, rows)


def _adc_tables(cent: DataFrame, qsub: DataFrame):
    """The two broadcast-sized ADC relations shared by every PQ
    consumer (in-query and staged): the per-query lookup table
    lut = (query_id, sub, code, dot(q_sub, codeword)) and the codeword
    sqnorm table cw = (sub, code, |codeword|^2)."""
    lut = qsub.join(cent, "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        F.col("cell").alias("code"),
        _dot(F.col("sv"), F.col("cv")).alias("pdot"),
    )
    sq = F.aggregate(
        F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cw = cent.select("sub", F.col("cell").alias("code"), sq.alias("csq"))
    return lut, cw


def _adc_fold(cand_codes: DataFrame, lut: DataFrame, cw: DataFrame, qnrm: DataFrame) -> DataFrame:
    """ADC scoring: (query_id, neighbor_id, sub, code) candidates fold
    against the broadcast lut/cw tables into (query_id, neighbor_id,
    approx_cosine) — partial dots and sqnorms sum through DECIMAL so
    the cross-subspace order cannot flip the hash, the reconstructed
    norm is sqrt of the summed codeword sqnorms. ONE spelling of the
    scoring arithmetic, consumed by sim_ivf_truepq (transient build)
    and sim_ivf_staged_pq (persisted index) — the bit-equality
    contract between them holds because this is literally the same
    code."""
    return (
        cand_codes.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .join(F.broadcast(cw), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("pdot").cast("decimal(28,12)")).cast("double").alias("num"),
            F.sum(F.col("csq").cast("decimal(28,12)")).cast("double").alias("csqs"),
        )
        .join(F.broadcast(qnrm), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("num") / (F.col("qnrm") * F.sqrt(F.col("csqs"))), 8
            ).alias("approx_cosine"),
        )
    )


def _truepq_scored(spark: SparkSession, sf_dir: str):
    """Shared true-PQ scoring stage under sim_ivf_truepq and
    sim_ivf_truepq_rerank: IVF front-end from ``_ivf_parts``, per-
    subspace codebooks from ``_pq_train``, corpus encoded to PQ_M
    codes per vector, and probe candidates scored by ADC — the
    approximate dot is the sum of PQ_M codebook-table lookups
    dot(q_sub, codeword[code]), and the reconstructed norm is
    sqrt(sum of codeword sqnorms): NO per-vector fp state survives on
    the index side, codes only. Partial dots and sqnorms sum through
    DECIMAL so the 4-way sum is order-independent on both engines.
    Returns ``(n, qn, scored)`` with scored = (query_id, neighbor_id,
    approx_cosine), unranked."""
    n, assign, probes = _ivf_parts(spark, sf_dir)
    sub = _pq_subvectors(n.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "v"))
    # train on the bounded deterministic sample (see PQ_TRAIN_SAMPLE);
    # the trained codebook feeds three consumers (encode, sqnorm table,
    # query LUT) — it is a LOCAL relation (r15, see _pq_train), so
    # every consumer reads 2048 local rows and no persist is needed.
    cent = _pq_train(sub.filter(F.col("vec_id") < N_QUERIES + PQ_TRAIN_SAMPLE))
    codes = _pq_assign(sub, cent).select(
        F.col("vec_id").alias("neighbor_id"), "sub", F.col("cell").alias("code")
    )
    qsub = _pq_subvectors(
        n.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "v")
    )
    lut, cw = _adc_tables(cent, qsub)
    qn = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cand_codes = (
        probes.join(assign, "cell")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .join(codes, "neighbor_id")
    )
    scored = _adc_fold(cand_codes, lut, cw, qn.select("query_id", "qnrm"))
    return n, qn, scored


def _pq_ctes() -> str:
    """The true-PQ oracle CTE chain appended to _IVF_CTES: per-subspace
    Lloyd UNROLLED (the _kmeans_blocks pattern with the sub column
    threaded through every key), final-codebook encode, codeword
    sqnorm table, query LUT, and the ADC-scored candidate relation."""
    sd = PQ_SUBDIM
    d2 = (
        "list_sum(list_transform(list_zip(s.sv, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    blocks = [
        f"""
sub AS (
  SELECT vec_id, t.s AS sub, list_slice(v, t.s*{sd}+1, t.s*{sd}+{sd}) AS sv
  FROM e, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) t
  WHERE vec_id >= {N_QUERIES}
),
subt AS (
  SELECT * FROM sub WHERE vec_id < {N_QUERIES + PQ_TRAIN_SAMPLE}
),
pcent0 AS (
  SELECT sub, CAST(vec_id - {N_QUERIES} AS INT) AS cell, sv AS cv
  FROM sub WHERE vec_id < {N_QUERIES + PQ_K}
)"""
    ]
    for i in range(PQ_ITERS):
        blocks.append(
            f"""
passign{i} AS (
  SELECT vec_id, sub, cell, sv FROM (
    SELECT s.vec_id, s.sub, c.cell, s.sv,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM subt s JOIN pcent{i} c ON c.sub = s.sub
  ) WHERE rn = 1
),
pcent{i + 1} AS (
  SELECT sub, cell, list(c ORDER BY d) AS cv
  FROM (SELECT sub, cell, u.d,
               CAST(sum(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        FROM passign{i},
             LATERAL (SELECT unnest(generate_series(1, len(sv))) AS d,
                             unnest(sv) AS x) u
        GROUP BY sub, cell, u.d)
  GROUP BY sub, cell
)"""
        )
    fin = PQ_ITERS
    blocks.append(
        f"""
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.cell AS code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM sub s JOIN pcent{fin} c ON c.sub = s.sub
  ) WHERE rn = 1
),
cw AS (
  SELECT sub, cell AS code, list_sum(list_transform(cv, x -> x * x)) AS csq
  FROM pcent{fin}
),
qsub AS (
  SELECT vec_id AS query_id, t.s AS sub,
         list_slice(v, t.s*{sd}+1, t.s*{sd}+{sd}) AS sv
  FROM e, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) t
  WHERE vec_id < {N_QUERIES}
),
lut AS (
  SELECT q.query_id, c.sub, c.cell AS code, list_dot_product(q.sv, c.cv) AS pdot
  FROM qsub q JOIN pcent{fin} c ON c.sub = q.sub
),
pqscored AS (
  SELECT s.query_id, s.neighbor_id,
         round(s.num / (qn.nrm * sqrt(s.csqs)), 8) AS approx_cosine
  FROM (
    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
           CAST(sum(CAST(l.pdot AS DECIMAL(28,12))) AS DOUBLE) AS num,
           CAST(sum(CAST(w.csq AS DECIMAL(28,12))) AS DOUBLE) AS csqs
    FROM probes p
    JOIN assign a ON a.cell = p.cell AND a.vec_id >= {N_QUERIES}
    JOIN codes k ON k.vec_id = a.vec_id
    JOIN lut l ON l.query_id = p.vec_id AND l.sub = k.sub AND l.code = k.code
    JOIN cw w ON w.sub = k.sub AND w.code = k.code
    GROUP BY p.vec_id, a.vec_id
  ) s JOIN n qn ON qn.vec_id = s.query_id
)"""
    )
    return ",".join(blocks)


@query(
    "sim_ivf_truepq",
    oracle="WITH " + _IVF_CTES + "," + _pq_ctes() + """
SELECT query_id, neighbor_id, approx_cosine FROM (
  SELECT query_id, neighbor_id, approx_cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY approx_cosine DESC, neighbor_id) AS rn
  FROM pqscored
) WHERE rn <= 3
""",
)
def sim_ivf_truepq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + TRUE product quantization (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the 64-dim corpus is
    split into PQ_M=8 subspaces of 8 dims; each subspace trains a
    PQ_K=256-codeword codebook with the repo's deterministic Lloyd
    construction (seed = first PQ_K corpus subvectors, DECIMAL-exact
    means — the kmeans_train recipe, generalized by a subspace group
    key so all 8 codebooks train in ONE grouped pipeline); every
    corpus vector is encoded as 8 codes x 8 bits = 8 bytes (the
    FAISS-standard PQ8x8 layout). Scoring is ADC (asymmetric distance
    computation): per query, an 8x256-entry lookup table of
    dot(q_sub, codeword) is built once (a broadcast relation for all
    10 queries), and a candidate's approximate dot is the sum of its
    8 table lookups; the reconstructed norm is derived from the
    codeword sqnorm table — unlike sim_ivf_sq8, NO per-vector fp
    state survives on the index side. That is the 32x memory
    reduction (256 fp bytes -> 8 code bytes) a genuinely memory-bound
    100 TB vector index runs, at the price of real quantization
    error: measured recall@3 vs the exact top-3 is recorded in
    SCALING.md (tools/measure_ann_recall.py) next to the geometry
    sweep that chose 8x256, with the fp re-rank recovery path in
    sim_ivf_truepq_rerank.

    100 TB shape: training runs on a deterministic bounded sample
    (PQ_TRAIN_SAMPLE — the FAISS practice; cost constant in corpus
    size) with a broadcast codebook, shuffling only (sub, cell, dim)
    partial sums; encoding is one broadcast join over the full
    corpus; query-time cost per
    candidate is PQ_M integer-keyed lookups against two broadcast
    tables plus a 4-row DECIMAL sum — no fp vector is read after the
    shortlist leaves the index. Cross-engine determinism: codes are
    integer argmins with cell-asc tie-break over identically-folded
    doubles (green kmeans precedent), and the cross-subspace sums go
    through DECIMAL so partial order cannot flip the hash."""
    _, _, scored = _truepq_scored(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "approx_cosine")
    )


@query(
    "sim_ivf_truepq_rerank",
    oracle="WITH " + _IVF_CTES + "," + _pq_ctes() + f""",
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_cosine DESC, neighbor_id) AS rn
    FROM pqscored
  ) WHERE rn <= {PQ_RERANK_R}
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) AS cosine,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) DESC,
                    s.neighbor_id) AS rn
  FROM shortlist s
  JOIN n qn  ON qn.vec_id = s.query_id
  JOIN n cn_ ON cn_.vec_id = s.neighbor_id
) WHERE rn <= 3
""",
)
def sim_ivf_truepq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval over the 2-byte PQ index: stage 1
    shortlists the top-{PQ_RERANK_R} per query by the ADC score
    (codes-only index traffic), stage 2 re-ranks ONLY the shortlist
    against the full-precision vectors and emits exact-cosine top-3 —
    the recovery path for PQ's quantization error (SCALING.md records
    the recall delta this closes vs sim_ivf_truepq). Identical
    architecture to sim_ivf_sq8_rerank; only the stage-1 quantizer
    differs (codebook ADC vs per-vector int8)."""
    n, qn, scored = _truepq_scored(spark, sf_dir)
    w1 = W.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= PQ_RERANK_R)
        .select("query_id", "neighbor_id")
    )
    cn_ = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm")
    exact = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.join(F.broadcast(qn), "query_id")
        .join(cn_, "neighbor_id")
        .select("query_id", "neighbor_id", exact.alias("cosine"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


BRP_RECALL_TOL = 0.8  # measured overall recall@3: 0.933 (sf0.01), 0.967 (sf0.1)


@query(
    "sim_brp_lsh_mllib",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS sq FROM e
),
q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM n WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(sqrt(q.sq + c.sq - 2 * list_dot_product(q.v, c.v)), 6)
           AS euclidean_dist
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, euclidean_dist, true AS recall_ok FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY euclidean_dist, neighbor_id) <= 3
""",
)
def sim_brp_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH ANN with a recall-tolerance
    verdict (the pattern that made the approx aggregates driver-
    verifiable): the JVM-seeded projections aren't SQL-reproducible,
    so the query emits the EXACT euclidean top-3 per query (engine-
    reproducible: same sumsq/dot fold on both sides) plus a boolean
    ``recall_ok`` = MLlib ANN overall recall@3 >= 0.8 (measured
    0.93-0.97). The oracle returns the same exact top-3 and literal
    true — an MLlib recall regression flips the hash.

    Fully distributed: one ``approxSimilarityJoin`` between the query
    set and the corpus (bucket-colocated candidate pairs, no
    driver-side loop), per-query top-3 window, then a broadcast join
    of the exact top-3 against the ANN hits for the recall scalar.
    Scales with candidate-pair density, not n_queries x corpus."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    base = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    sumsq = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    n = base.select("vec_id", "v", sumsq.alias("sq"))
    q_ = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("sq").alias("qsq"),
    )
    c_ = n.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("sq").alias("csq"),
    )
    dist = F.round(
        F.sqrt(
            F.col("qsq") + F.col("csq") - F.lit(2.0) * _dot(F.col("qv"), F.col("cv"))
        ),
        6,
    )
    w = W.partitionBy("query_id").orderBy(F.asc("euclidean_dist"), F.asc("neighbor_id"))
    exact = (
        F.broadcast(q_)
        .crossJoin(c_)
        .select("query_id", "neighbor_id", dist.alias("euclidean_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )

    vec = base.select("vec_id", array_to_vector("v").alias("features"))
    corpus = vec.filter(F.col("vec_id") >= N_QUERIES)
    queries_ = vec.filter(F.col("vec_id") < N_QUERIES)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(corpus)
    ann = model.approxSimilarityJoin(
        queries_, corpus, threshold=float("inf"), distCol="distCol"
    ).select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.col("distCol").alias("d"),
    )
    wa = W.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    ann3 = (
        ann.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    recall = (
        exact.join(ann3, ["query_id", "neighbor_id"], "left")
        .agg(
            (
                F.coalesce(
                    F.sum("hit").cast("double") / F.count(F.lit(1)), F.lit(1.0)
                )
                >= BRP_RECALL_TOL
            ).alias("recall_ok")
        )
    )
    return exact.crossJoin(F.broadcast(recall))


RANGE_TAU = 0.15  # synthetic embeddings are near-orthogonal (same-bucket max ~0.25);
# tau chosen so the sf0.01 gate verifies a non-trivial result set


@query(
    "sim_range_search",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         {_bucket_sql('v')} AS bucket
  FROM e
),
q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM n WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 8) AS cosine
  FROM q JOIN c ON q.bucket = c.bucket
)
SELECT query_id, neighbor_id, cosine FROM scored WHERE cosine >= {RANGE_TAU}
""",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold (range) similarity search — the retrieval twin of the
    top-k path: every same-LSH-bucket candidate with cosine >= tau,
    however many there are. This is the shape dedup-by-similarity and
    recall-oriented retrieval use at 100 TB (top-k caps recall; range
    search caps *distance*): corpus shuffles once by bucket, the tau
    filter runs inside the scoring stage, output size tracks true
    neighborhood density, not k x n_queries."""
    e = load_spread(spark, sf_dir, "embeddings")
    n = (
        e.select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn("bucket", _bucket_spark(F.col("v")))
        .transform(track)
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    c = n.filter(F.col("vec_id") >= N_QUERIES)
    return (
        q.join(c, "bucket")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 8
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= RANGE_TAU)
    )


@query(
    "embed_normalize_quantize",
    oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
m AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x)))      AS nrm,
         list_max(list_transform(v, x -> abs(x)))           AS mx
  FROM e
)
SELECT vec_id,
       round(nrm, 6) AS l2_norm,
       array_to_string(
         list_transform(v, x -> CAST(round(x * 127 / nullif(mx, 0)) AS BIGINT)),
         '|') AS int8_vec,
       round(mx / 127, 8) AS scale
FROM m
""",
)
def embed_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression for vector-store loading: per-vector L2
    norm plus symmetric int8 quantization (q_i = round(x_i * 127 /
    max|x|), dequantize with the emitted scale). At 100 TB this is the
    4x storage/bandwidth reduction step before ANN index build; all
    expression-level (HOF fold + transform), no Python. The quantized
    vector is emitted '|'-joined (driver hash cannot digest arrays);
    the oracle recomputes identical integers from the same doubles."""
    e = load_spread(spark, sf_dir, "embeddings")
    v = _as_double("embedding")
    m = e.select(
        "vec_id",
        v.alias("v"),
        _norm(v).alias("nrm"),
        F.array_max(F.transform(v, F.abs)).alias("mx"),
    )
    return m.select(
        "vec_id",
        F.round("nrm", 6).alias("l2_norm"),
        F.array_join(
            F.transform(
                F.col("v"),
                lambda x: F.round(x * 127 / F.nullif(F.col("mx"), F.lit(0.0)))
                .cast("bigint")
                .cast("string"),
            ),
            "|",
        ).alias("int8_vec"),
        F.round(F.col("mx") / 127, 8).alias("scale"),
    )


K_CELLS = 8
KMEANS_ITERS = 2


def _kmeans_blocks(k: int, iters: int) -> list[str]:
    """The unrolled Lloyd's-iteration CTE blocks shared by every oracle
    that replays the deterministic k-means (kmeans_train itself and
    dedup_semantic's cluster step): same seed (first k vectors), same
    tie-break (cell asc), same decimal-exact means. Joining the blocks
    with ',' after 'WITH ' yields assign{iters-1} (final membership)
    and cent{iters} (final centroids)."""
    sq = "list_sum(list_transform(list_zip(n.v, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2])))"
    blocks = [
        """
e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (SELECT vec_id, v FROM e),
cent0 AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < %d
)""" % k
    ]
    for i in range(iters):
        blocks.append(f"""
assign{i} AS (
  SELECT vec_id, cell, v FROM (
    SELECT n.vec_id, c.cell, n.v,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {sq} ASC, c.cell ASC) AS rn
    FROM n CROSS JOIN cent{i} c
  ) WHERE rn = 1
),
cent{i + 1} AS (
  SELECT cell, list(c ORDER BY d) AS cv
  FROM (SELECT cell, u.d, CAST(sum(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE)
                            / count(*) AS c
        FROM assign{i},
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS d,
                             unnest(v) AS x) u
        GROUP BY cell, u.d)
  GROUP BY cell
)""")
    return blocks


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as DuckDB CTEs (the oracle for the
    iterative Spark loop — same seed, same tie-break, same
    decimal-exact means)."""
    blocks = _kmeans_blocks(k, iters)
    last = iters - 1
    return (
        "WITH " + ",".join(blocks) + f"""
SELECT a.cell,
       count(*)::BIGINT AS n_members,
       round(list_sum(list_transform(any_value(c.cv), x -> x * x)), 6)
         AS centroid_sqnorm
FROM assign{last} a JOIN cent{last + 1} c USING (cell)
GROUP BY a.cell
"""
    )


def _argmin_d2_sql(crows, vexpr: str = "v") -> str:
    """Nearest-centroid cell by squared distance as ONE scalar
    expression: least() over (d2, cell) structs — lexicographic struct
    comparison IS the oracle's (d2 asc, cell asc) tie-break. Each d2
    is the left-associated sum of squared differences against the
    LITERAL centroid, bit-identical to the zip_with/aggregate fold
    (the fold's 0.0 seed adds exactly nothing to a first term that is
    a square)."""
    if not crows:
        raise ValueError(
            "empty centroid set: the seed filter matched no rows"
        )

    def d2(cv):
        # the fold-with-literal-array spelling (the r14 _dot_lit_sql
        # device): tree size O(DIM) per cell — the inlined element_at
        # spelling was measured to REGRESS (a ~2k-node Catalyst tree
        # per cell re-walked on every iteration's planning).
        return (
            f"aggregate(zip_with({vexpr}, {_vec_sql(cv)}, "
            "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
        )

    if len(crows) == 1:
        return f"{crows[0][0]}L"
    structs = ",".join(
        f"named_struct('s', {d2(cv)}, 'c', {c}L)" for c, cv in crows
    )
    return f"least({structs}).c"


def _lloyd_assign_relational(base: DataFrame, k: int, iters: int):
    """The distributed Lloyd spelling (broadcast cross-join + two-pass
    hash argmin per iteration, posexplode DECIMAL-mean update) — the
    fallback when k x DIM outgrows the literal-centroid device, and
    the replica the literal path is pinned against in tests."""
    cent = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    assign = None
    for _ in range(iters):
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        assign = (
            hash_argmin(base, cent, None, d2, ["vec_id"])
            .join(base, "vec_id")
            .select("vec_id", "cell", "v")
        )
        dims = assign.select("cell", F.posexplode("v").alias("d0", "x"))
        cent = (
            dims.groupBy("cell", "d0")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d0", "c"))),
                    lambda s: s.getField("c"),
                ).alias("cv")
            )
        )
    return assign, cent


def lloyd_assign(base: DataFrame, k: int, iters: int):
    """Deterministic Lloyd's k-means over ``base`` (vec_id, v) — the
    shared cluster core under kmeans_train and dedup_semantic. Seed =
    the first k vectors, ties on cell asc, DECIMAL-exact means, so the
    DuckDB blocks from :func:`_kmeans_blocks` replay it exactly.
    Returns ``(assign, cent)``: final membership (vec_id, cell, v) and
    final centroids (cell, cv — a LOCAL relation).

    r15 (guide §2.4, the r14 literal-quantizer discipline): the
    centroid set is CELL-DOMAIN-sized (k rows), so each iteration
    collects it (bounded control-plane collect, doubles round-trip
    exactly) and assignment becomes a pure projection — the literal
    argmin expression of :func:`_argmin_d2_sql` — with the update ONE
    groupBy(cell) carrying DIM decimal-sum buffers, map-side combined
    (bit-identical to the posexplode spelling: DECIMAL sums are exact
    and order-free, per-dim division unchanged). Per iteration: one
    map-side-combined exchange and one k-row collect; the corpus is
    never expanded, joined, or argmin-aggregated. The relational
    spelling remains as the guarded fallback for k x DIM beyond the
    codegen-safe literal budget (LITERAL_ARGMIN_MAX_DOUBLES), and as
    the bit-equality replica in tests."""
    if k * DIM > LITERAL_ARGMIN_MAX_DOUBLES:
        return _lloyd_assign_relational(base, k, iters)
    spark = base.sparkSession
    # base feeds iters+1 actions (seed collect + one update collect
    # per iteration) plus the returned assign — persist it once.
    base = track(base)
    seed = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    crows = sorted(
        (int(r["cell"]), [float(x) for x in r["cv"]])
        for r in seed.collect()
    )
    dims = range(1, DIM + 1)
    sums_sql = (
        "named_struct('n', count(1), "
        + ", ".join(
            f"'s{d}', sum(cast(element_at(v, {d}) as decimal(28,12)))"
            for d in dims
        )
        + ")"
    )
    cv_sql = (
        "array("
        + ", ".join(f"(cast(_a.s{d} as double) / _a.n)" for d in dims)
        + ") AS cv"
    )
    assign = None
    for _ in range(iters):
        assign = base.selectExpr(
            "vec_id", f"{_argmin_d2_sql(crows)} AS cell", "v"
        ).select("vec_id", "cell", "v")
        upd = (
            assign.groupBy("cell")
            .agg(F.expr(sums_sql).alias("_a"))
            .selectExpr("cell", cv_sql)
        )
        crows = sorted(
            (int(r["cell"]), [float(x) for x in r["cv"]])
            for r in upd.collect()
        )
    cent = spark.createDataFrame(
        [(c, list(cv)) for c, cv in crows], "cell bigint, cv array<double>"
    )
    return assign, cent


@query("kmeans_train", oracle=_kmeans_oracle(K_CELLS, KMEANS_ITERS))
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means (k=8, 2 iterations) in pure DataFrame
    ops — the trained coarse quantizer behind IVF indexes, and the
    engine's demonstration that ITERATIVE ML training fits the
    declarative model: per iteration, assignment is a broadcast
    cross-join + two-pass hash argmin (centroids are tiny; the
    expanded corpus never shuffles or sorts), and the update is one
    explode->decimal-exact-mean->rebuild aggregation. Deterministic by
    construction (seed = the first k vectors, ties broken on cell id,
    means summed through DECIMAL), so the DuckDB oracle replays the
    identical unrolled iterations. At 100 TB: per iteration one
    broadcast + one shuffle of (cell, dim) partial sums — the same
    cost model as MLlib's KMeans, with auditable arithmetic."""
    e = load_spread(spark, sf_dir, "embeddings")
    base = e.select("vec_id", _as_double("embedding").alias("v"))
    assign, cent = lloyd_assign(base, K_CELLS, KMEANS_ITERS)
    sqnorm = F.aggregate(
        F.transform(F.col("cv"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return (
        assign.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(cent, "cell")
        .select("cell", "n_members", F.round(sqnorm, 6).alias("centroid_sqnorm"))
    )


@query(
    "embed_gram_matrix",
    oracle=f"""
WITH e AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
ij AS (
  SELECT i, j
  FROM generate_series(0, {DIM - 1}) s(i), generate_series(0, {DIM - 1}) t(j)
  WHERE j >= i
)
SELECT i::BIGINT AS i, j::BIGINT AS j,
       round(CAST(sum(CAST(v[i + 1] * v[j + 1] AS DECIMAL(30, 18)))
                  AS DOUBLE), 6) AS gram,
       count(*)::BIGINT AS n_vecs
FROM e CROSS JOIN ij
GROUP BY i, j
""",
)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix (X^T X upper triangle) over the
    embedding corpus — the linear-algebra primitive under PCA
    whitening / low-rank projection of an embedding space (subtract
    the mean column first and it is the covariance matrix; MLlib's
    RowMatrix.computeGramianMatrix is the same reduction).

    100 TB shape: each row expands to dim*(dim+1)/2 = 2080 products
    INSIDE whole-stage codegen (two nested Generates), and map-side
    partial aggregation collapses them to at most 2080 rows per
    partition before anything touches the wire — the one Exchange
    carries O(dim^2 x partitions), never O(dim^2 x rows), and the
    final state is dim^2/2 regardless of corpus size (plan-asserted).
    Products go through DECIMAL(30,18) so the sum is order-independent
    and bit-equal to the DuckDB twin under any partitioning. On a real
    cluster the per-batch product loop would drop to a numpy/BLAS
    partial Gram via mapInPandas with the SAME tiny-shuffle merge; the
    expression spelling keeps this oracle-exact and JVM-side."""
    e = load_spread(spark, sf_dir, "embeddings").select(
        _as_double("embedding").alias("v")
    )
    rows = (
        e.select("v", F.explode(F.sequence(F.lit(0), F.lit(DIM - 1))).alias("i"))
        .select(
            "v", "i", F.explode(F.sequence(F.col("i"), F.lit(DIM - 1))).alias("j")
        )
        .select(
            "i",
            "j",
            (
                F.element_at("v", F.col("i") + 1)
                * F.element_at("v", F.col("j") + 1)
            )
            .cast("decimal(30,18)")
            .alias("p"),
        )
    )
    return (
        rows.groupBy("i", "j")
        .agg(
            F.round(F.sum("p").cast("double"), 6).alias("gram"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            "gram",
            "n_vecs",
        )
    )


_PCA_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
ij AS (
  SELECT i, j
  FROM generate_series(0, {DIM - 1}) s(i), generate_series(0, {DIM - 1}) t(j)
  WHERE j >= i
),
tri AS (
  SELECT i, j,
         round(CAST(sum(CAST(v[i + 1] * v[j + 1] AS DECIMAL(30, 18)))
                    AS DOUBLE), 6) AS g
  FROM e CROSS JOIN ij GROUP BY i, j
),
full_g AS (
  SELECT i, j, g FROM tri
  UNION ALL
  SELECT j AS i, i AS j, g FROM tri WHERE i <> j
),
v0 AS (SELECT i AS d, 0.125::DOUBLE AS v FROM generate_series(0, {DIM - 1}) s(i)),
u1 AS (
  SELECT f.i AS d, CAST(sum(CAST(f.g * v0.v AS DECIMAL(30, 18))) AS DOUBLE) AS u
  FROM full_g f JOIN v0 ON f.j = v0.d GROUP BY f.i
),
n1 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(30, 18))) AS DOUBLE)) AS nrm FROM u1),
v1 AS (SELECT d, round(u / (SELECT nrm FROM n1), 12) AS v FROM u1),
u2 AS (
  SELECT f.i AS d, CAST(sum(CAST(f.g * v1.v AS DECIMAL(30, 18))) AS DOUBLE) AS u
  FROM full_g f JOIN v1 ON f.j = v1.d GROUP BY f.i
),
n2 AS (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(30, 18))) AS DOUBLE)) AS nrm FROM u2),
v2 AS (SELECT d, round(u / (SELECT nrm FROM n2), 12) AS v FROM u2),
pc AS (SELECT list(v ORDER BY d) AS p FROM v2)
SELECT vec_id, round(list_dot_product(e.v, (SELECT p FROM pc)), 8) AS pc1
FROM e
"""


@query("embed_pca_project", oracle=_PCA_ORACLE)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component projection of the embedding corpus:
    power iteration (2 unrolled rounds, the kmeans_train /
    graph_pagerank iterative-algorithm pattern) on the Gram matrix,
    then every vector scored against the resulting component — the
    dimensionality-reduction / whitening step of an embedding
    pipeline, expressed entirely as DataFrame ops.

    100 TB shape: the corpus is touched exactly TWICE (once to build
    the dim^2-sized Gram — see embed_gram_matrix — once for the final
    projection map); the iteration itself runs on the 2080-row gram
    relation joined against a 64-row vector relation, so its cost is
    independent of corpus size and there is NO driver-side collect —
    the component reaches the projection as a broadcast one-row array.
    Every mat-vec product and norm goes through DECIMAL(30,18) and
    each round's vector is rounded to 12 decimals, so both engines
    walk the identical trajectory (sign and all) and the oracle is
    exact to the final rounding.

    Oracle fragility note: the per-round round(x, 12) happens on a
    DOUBLE in both engines, so exactness additionally depends on
    Spark's HALF_UP agreeing with DuckDB's rounding at every
    intermediate — true on this dataset (verified green), but a
    last-ulp tie on other data could flip one trajectory step and fail
    the digest despite a correct implementation. If that ever bites,
    move the rounding itself into DECIMAL on both engines (cast before
    round) so the algorithm is identical by construction."""
    tri = embed_gram_matrix(spark, sf_dir).select("i", "j", "gram")
    full = tri.union(
        tri.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "gram"
        )
    )
    dec = "decimal(30,18)"
    v = spark.range(DIM).select(
        F.col("id").alias("d"), F.lit(0.125).cast("double").alias("v")
    )
    for _ in range(2):
        u = (
            full.join(v, full.j == v.d)
            .groupBy("i")
            .agg(
                F.sum((F.col("gram") * F.col("v")).cast(dec))
                .cast("double")
                .alias("u")
            )
        )
        norm = u.agg(
            F.sqrt(F.sum((F.col("u") * F.col("u")).cast(dec)).cast("double")).alias(
                "nrm"
            )
        )
        v = u.crossJoin(F.broadcast(norm)).select(
            F.col("i").alias("d"),
            F.round(F.col("u") / F.col("nrm"), 12).alias("v"),
        )
    pc = v.agg(
        F.expr("transform(array_sort(collect_list(struct(d, v))), x -> x.v)").alias(
            "pc"
        )
    )
    e = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    return e.crossJoin(F.broadcast(pc)).select(
        "vec_id", F.round(_dot(F.col("emb"), F.col("pc")), 8).alias("pc1")
    )


PANDAS_RECALL_TOL = 0.9  # measured agreement vs the exact fold: 1.0


@query(
    "sim_bruteforce_pandas",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
),
q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT * FROM n WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 8) AS cosine
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, cosine, true AS pandas_ok FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= 3
""",
)
def sim_bruteforce_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized brute-force scoring — the numpy/BLAS path the
    embed_gram_matrix docstring promises for real clusters, shipped as
    a first-class query with the MLlib recall-tolerance verdict
    pattern: corpus partitions stream through ``mapInPandas`` in Arrow
    batches, each batch scoring ALL queries at once with one
    (batch x dim) @ (dim x n_queries) matrix product and emitting its
    LOCAL top-{TOP_K} per query; a global top-3 window merges the
    shards — the score-locally/merge-top-k architecture
    sim_bruteforce_topk describes, actually executed through the
    vectorized Python path. BLAS accumulation order differs from the
    engines' sequential fold (pairwise summation), so the pandas
    ranking is NOT bit-reproducible by a SQL oracle; the query
    therefore emits the EXACT JVM-fold top-3 (bit-matched to the
    oracle) plus a ``pandas_ok`` boolean = the vectorized path's
    overlap with it >= {PANDAS_RECALL_TOL} (measured 1.0 at
    sf0.01/sf0.1) — a numpy scoring bug flips the hash.

    The 10-row query set is collected to the driver and broadcast —
    principled, not a hot-path collect: a query SET is request-sized
    by definition (it arrives from the user), and this is exactly how
    a production ANN service ships its query batch to executors."""
    import numpy as np
    import pandas as pd

    from ..api import topk_cosine

    e = load_spread(spark, sf_dir, "embeddings")
    base = e.select("vec_id", _as_double("embedding").alias("v"))
    qrows = base.filter(F.col("vec_id") < N_QUERIES).collect()
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.v for r in qrows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)
    bq = spark.sparkContext.broadcast((qids, Q, Qn))

    def score(batches):
        ids_q, Qm, Qnorm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.array(list(pdf["v"]), dtype=np.float64)
            Mn = np.linalg.norm(M, axis=1)
            S = (M @ Qm.T) / (Mn[:, None] * Qnorm[None, :])
            k = min(TOP_K, len(ids))
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids_q)):
                top = np.argpartition(-S[:, j], k - 1)[:k]
                out_q.extend([int(ids_q[j])] * k)
                out_n.extend(int(i) for i in ids[top])
                out_c.extend(float(x) for x in S[top, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    corpus = base.filter(F.col("vec_id") >= N_QUERIES)
    local = corpus.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    pandas_top = (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    exact = (
        topk_cosine(
            corpus=corpus,
            queries=base.filter(F.col("vec_id") < N_QUERIES),
            id_col="vec_id",
            vec_col="v",
            k=TOP_K,
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
        .transform(track)  # consumed by the result AND the verdict join
    )
    hits = exact.join(pandas_top, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("double").alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).cast("double").alias("n_tot"))
    ok = (
        hits.crossJoin(tot)
        .select(
            (F.col("n_hit") / F.col("n_tot") >= PANDAS_RECALL_TOL).alias(
                "pandas_ok"
            )
        )
    )
    return exact.crossJoin(F.broadcast(ok)).select(
        "query_id", "neighbor_id", "cosine", "pandas_ok"
    )


#: margin-based bitext mining: neighborhood size for the margin
#: denominator and the acceptance threshold on the margin ratio.
MARGIN_K = 4
MARGIN_TAU = 1.01


@query(
    "sim_bitext_margin_mining",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
),
a AS (SELECT * FROM n WHERE vec_id % 2 = 0),
b AS (SELECT * FROM n WHERE vec_id % 2 = 1),
scored AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 8) AS cos
  FROM a CROSS JOIN b
),
ar AS (
  SELECT a_id, b_id, cos,
         row_number() OVER (PARTITION BY a_id
                            ORDER BY cos DESC, b_id) AS rn_a
  FROM scored
),
br AS (
  SELECT a_id, b_id, cos,
         row_number() OVER (PARTITION BY b_id
                            ORDER BY cos DESC, a_id) AS rn_b
  FROM scored
),
da AS (
  SELECT a_id, CAST(sum(CAST(cos AS DECIMAL(20,8))) AS DOUBLE)
               / {MARGIN_K} AS dena
  FROM ar WHERE rn_a <= {MARGIN_K} GROUP BY 1
),
db AS (
  SELECT b_id, CAST(sum(CAST(cos AS DECIMAL(20,8))) AS DOUBLE)
               / {MARGIN_K} AS denb
  FROM br WHERE rn_b <= {MARGIN_K} GROUP BY 1
)
SELECT ar.a_id, ar.b_id, ar.cos AS cosine,
       round(ar.cos / ((da.dena + db.denb) / 2), 6) AS margin,
       round(ar.cos / ((da.dena + db.denb) / 2), 6) > {MARGIN_TAU}
         AS accepted
FROM ar
JOIN br ON br.a_id = ar.a_id AND br.b_id = ar.b_id AND br.rn_b = 1
JOIN da ON da.a_id = ar.a_id
JOIN db ON db.b_id = ar.b_id
WHERE ar.rn_a = 1
""",
)
def sim_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mutual-nearest-neighbor mining (the Artetxe &
    Schwenk criterion behind LASER/CCMatrix bitext mining): a
    candidate pair survives only if each side is the other's TOP-1
    neighbor AND the cosine beats the average of each side's
    {MARGIN_K}-NN neighborhood by the margin ratio — the device that
    kills hubness false positives raw cosine thresholds admit. The
    even/odd vec_id halves stand in for the two languages' embedding
    spaces.

    This fixture scores all pairs (the correctness baseline, same
    policy as sim_bruteforce_topk: one side broadcast, corpus streams
    through one scoring stage); at 100 TB the candidate generation
    swaps to the bucketed ANN paths (sim_lsh_ann multi-probe /
    sim_ivf_* — decontaminate_semantic_lsh shows the bucket-join
    spelling) with the SAME margin rescore on candidates. Cosines
    round at 8 before ranking (ties then break on id identically);
    margin denominators are averages of rounded cosines summed
    through DECIMAL(20,8), so both engines rank, average, and flag
    identically."""
    e = load_spread(spark, sf_dir, "embeddings")
    n = e.select(
        "vec_id",
        _as_double("embedding").alias("v"),
    ).select("vec_id", "v", _norm(F.col("v")).alias("nrm"))
    a = n.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
    )
    b = n.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    )
    scored = (
        b.crossJoin(F.broadcast(a))
        .select(
            "a_id",
            "b_id",
            F.round(
                _dot(F.col("av"), F.col("bv")) / (F.col("anrm") * F.col("bnrm")),
                8,
            ).alias("cos"),
        )
        .transform(track)
    )
    wa = W.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    wb = W.partitionBy("b_id").orderBy(F.desc("cos"), F.asc("a_id"))
    ar = scored.withColumn("rn_a", F.row_number().over(wa))
    br = scored.withColumn("rn_b", F.row_number().over(wb))
    da = (
        ar.filter(F.col("rn_a") <= MARGIN_K)
        .groupBy("a_id")
        .agg(
            (F.sum(F.col("cos").cast("decimal(20,8)")).cast("double") / MARGIN_K)
            .alias("dena")
        )
    )
    db = (
        br.filter(F.col("rn_b") <= MARGIN_K)
        .groupBy("b_id")
        .agg(
            (F.sum(F.col("cos").cast("decimal(20,8)")).cast("double") / MARGIN_K)
            .alias("denb")
        )
    )
    margin = F.round(F.col("cos") / ((F.col("dena") + F.col("denb")) / 2), 6)
    return (
        ar.filter(F.col("rn_a") == 1)
        .join(
            br.filter(F.col("rn_b") == 1).select("a_id", "b_id"),
            ["a_id", "b_id"],
        )
        .join(da, "a_id")
        .join(db, "b_id")
        .select(
            "a_id",
            "b_id",
            F.col("cos").alias("cosine"),
            margin.alias("margin"),
            (margin > MARGIN_TAU).alias("accepted"),
        )
    )


@query(
    "embed_isotropy_score",
    oracle="""
WITH x AS (
  SELECT label, u.d - 1 AS dim, CAST(embedding[u.d] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d) u
),
dimvar AS (
  SELECT label, dim,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS mu,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) / count(*)
           - pow(CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 2)
           AS v
  FROM x GROUP BY label, dim
)
SELECT label,
       count(*)::BIGINT AS n_dims,
       round(CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE), 6)
         AS total_variance,
       round(max(v) / CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE), 6)
         AS max_dim_share,
       round(pow(CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE), 2)
             / CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE), 6)
         AS effective_dims
FROM dimvar GROUP BY label
""",
)
def embed_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy audit per label: per-dimension
    population variances folded into (a) total variance, (b) the
    largest single dimension's share, and (c) the participation ratio
    (sum v)^2 / sum v^2 — the \"effective dimensionality\" that equals
    d for a perfectly isotropic space and ~1 when one rogue dimension
    dominates. Anisotropy is the classic failure mode of contrastive
    embedding runs (Ethayarajh 2019); a collapsed space makes every
    cosine ANN tier above this useless, so this is the health gate a
    pipeline runs BEFORE building indexes.

    Plan: posexplode fans each vector into (label, dim, x) — a fixed
    d-factor, never data-dependent — then TWO map-side-combined
    aggregates: (label, dim) moment sums (DECIMAL-carried, so the
    reduction is order-free and engine-exact) and the label-level
    fold over d rows. State is labels x dims, independent of corpus
    size; nothing is collected."""
    e = load_spread(spark, sf_dir, "embeddings")
    x = e.select(
        "label", F.posexplode(_as_double("embedding")).alias("d0", "x")
    ).select("label", F.col("d0").alias("dim"), "x")
    n = F.count(F.lit(1))
    sx = F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)")).cast("double")
    dimvar = x.groupBy("label", "dim").agg(
        (sx / n).alias("mu"),
        (sxx / n - F.pow(sx / n, 2)).alias("v"),
    )
    sv = F.sum(F.col("v").cast("decimal(38,18)")).cast("double")
    svv = F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)")).cast("double")
    return dimvar.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.round(sv, 6).alias("total_variance"),
        F.round(F.max("v") / sv, 6).alias("max_dim_share"),
        F.round(F.pow(sv, 2) / svv, 6).alias("effective_dims"),
    )


MIPS_TOP = 3  # neighbors per query by inner product


@query(
    "sim_mips_transform",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id >= 10),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_sum(list_transform(range(1, len(qv) + 1),
                                       i -> qv[i] * cv[i])), 6) AS inner_product
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, inner_product,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY inner_product DESC, neighbor_id)::BIGINT
         AS rnk
FROM scored
QUALIFY rnk <= {MIPS_TOP}
""",
)
def sim_mips_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search via the cosine reduction
    (Bachrach et al. 2014 / Neyshabur-Srebro 2015): augment every
    corpus vector with an extra coordinate sqrt(M^2 - |x|^2) (M = max
    corpus norm, a broadcast scalar) and the query with 0 — then the
    augmented vectors all have norm M, so augmented COSINE order is
    exactly inner-product order and every cosine ANN tier above
    (LSH / IVF / PQ) serves MIPS unchanged. This is how recommender
    retrieval (user·item scores, where norms carry popularity and must
    NOT be normalized away) rides a cosine index.

    The Spark side scores through the transform — augmented cosine
    times |q|·M recovers the inner product — and the oracle computes
    raw inner products directly, so the hash PROVES the reduction is
    order-and-value exact (to the 6dp round; the fp round-trip error
    is ~1e-13). Plan: the sim_bruteforce shape — queries broadcast,
    one scoring pass, per-query top-{MIPS_TOP} window."""
    e = load_spread(spark, sf_dir, "embeddings")
    base = e.select("vec_id", _as_double("embedding").alias("v")).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm")
    ).transform(track)  # max-norm fold + both scoring sides
    mx = base.agg(F.max("nrm").alias("m"))
    q = base.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    c = base.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    # augmented-cosine scoring: cos~ = <q,x> / (|q| * M) because the
    # augmented corpus norm is EXACTLY M and the query pad is 0; the
    # extra corpus coordinate never meets a nonzero query coordinate,
    # so the dot product is untouched.
    scored = (
        c.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(mx))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (F.col("qnrm") * F.col("m"))
            ).alias("cos_aug"),
            "qnrm",
            "m",
        )
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_aug") * F.col("qnrm") * F.col("m"), 6).alias(
                "inner_product"
            ),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.desc("inner_product"), F.asc("neighbor_id")
                )
            )
            .cast("long"),
        )
        .where(F.col("rnk") <= MIPS_TOP)
    )


DRIFT_COS_FLOOR = 0.99  # centroid cosine below this flags drift


@query(
    "quality_embedding_drift",
    oracle=f"""
WITH x AS (
  SELECT label, vec_id % 2 AS half, u.d AS dim,
         CAST(embedding[u.d] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d) u
),
cent AS (
  SELECT label, half, dim,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c
  FROM x GROUP BY label, half, dim
),
pairs AS (
  SELECT a.label, a.dim, a.c AS c0, b.c AS c1
  FROM (SELECT * FROM cent WHERE half = 0) a
  JOIN (SELECT * FROM cent WHERE half = 1) b
    ON a.label = b.label AND a.dim = b.dim
),
sums AS (
  SELECT label,
         CAST(sum(CAST(c0 * c1 AS DECIMAL(38,18))) AS DOUBLE) AS dot,
         sqrt(CAST(sum(CAST(c0 * c0 AS DECIMAL(38,18))) AS DOUBLE)) AS n0,
         sqrt(CAST(sum(CAST(c1 * c1 AS DECIMAL(38,18))) AS DOUBLE)) AS n1
  FROM pairs GROUP BY label
),
counts AS (
  SELECT label,
         sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
         sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_cur
  FROM embeddings GROUP BY label
)
SELECT s.label, c.n_ref, c.n_cur,
       round(s.dot / (s.n0 * s.n1), 6) AS centroid_cosine,
       s.dot / (s.n0 * s.n1) < {DRIFT_COS_FLOOR} AS drifted
FROM sums s JOIN counts c ON s.label = c.label
""",
)
def quality_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between the
    REFERENCE half's centroid (even vec_ids — yesterday's index) and
    the CURRENT half's (odd — today's re-embed or new model), plus the
    population split. Centroid-cosine collapse is the cheap first
    alarm that an embedding model rev or upstream text change silently
    rotated the space — at which point every stored ANN index and
    cached neighbor list is stale (`quality_drift_psi` watches scalar
    distributions; this is its vector-space sibling).

    Plan: one posexplode fan-out (fixed d-factor), (label, half, dim)
    DECIMAL moment sums, then a d-row-per-label join and fold — state
    is labels x dims, corpus touched once; the count rollup rides the
    same scan."""
    e = load_spread(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(_as_double("embedding")).alias("dim", "x"),
    )
    cent = x.groupBy("label", "half", "dim").agg(
        (
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    a = cent.where(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0")
    )
    b = cent.where(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c1")
    )
    sums = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum((F.col("c0") * F.col("c1")).cast("decimal(38,18)"))
            .cast("double")
            .alias("dot"),
            F.sqrt(
                F.sum((F.col("c0") * F.col("c0")).cast("decimal(38,18)")).cast(
                    "double"
                )
            ).alias("n0"),
            F.sqrt(
                F.sum((F.col("c1") * F.col("c1")).cast("decimal(38,18)")).cast(
                    "double"
                )
            ).alias("n1"),
        )
    )
    counts = e.groupBy("label").agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("int")).cast("long").alias("n_ref"),
        F.sum((F.col("vec_id") % 2 == 1).cast("int")).cast("long").alias("n_cur"),
    )
    cosc = F.col("dot") / (F.col("n0") * F.col("n1"))
    return sums.join(counts, "label").select(
        "label",
        "n_ref",
        "n_cur",
        F.round(cosc, 6).alias("centroid_cosine"),
        (cosc < DRIFT_COS_FLOOR).alias("drifted"),
    )


def ivf_pq_staged_layout(spark: SparkSession, sf_dir: str):
    """The staged-PQ index: per-subspace codebooks as a tiny artifact
    plus the corpus's 8-byte PQ codes directory-partitioned by COARSE
    cell — `ivf_staged_layout`'s deployment shape with the
    full-precision corpus replaced by codes (the 32x-smaller body a
    memory-bound 100 TB index actually serves). Codebooks stage FIRST
    and the code build reads them back, so training runs once per
    fixture; parquet round-trips doubles and ints exactly, so staged
    scoring is bit-identical to the in-query build. Returns
    ``(codes, cent)`` readers: codes = (neighbor_id, sub, code, cell),
    cent = (sub, cell, cv)."""
    from ..operators.graph import (
        _STAGE_ROOT,
        _source_fingerprint,
        _stage,
        _stage_partitioned,
    )

    key = _source_fingerprint(sf_dir, ("embeddings",))

    def build_cent() -> DataFrame:
        n, _, _ = _ivf_parts(spark, sf_dir)
        sub = _pq_subvectors(
            n.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "v")
        )
        return _pq_train(
            sub.filter(F.col("vec_id") < N_QUERIES + PQ_TRAIN_SAMPLE)
        )

    cent = _stage(spark, os.path.join(_STAGE_ROOT, f"ivfpq_cent_{key}"), build_cent)

    def build_codes() -> DataFrame:
        # derive codes FROM the staged fp layout (the realistic ingest
        # pipeline: fp index first, PQ body derived) — its (vec_id,
        # cell) column IS the coarse assignment, so the corpus x cells
        # hash_argmin does not run a second time (r11-continuation
        # review finding)
        corp, _ = ivf_staged_layout(spark, sf_dir)
        sub = _pq_subvectors(corp.select("vec_id", "v"))
        codes = _pq_assign(sub, cent).select(
            "vec_id", "sub", F.col("cell").alias("code")
        )
        return codes.join(corp.select("vec_id", "cell"), "vec_id").select(
            F.col("vec_id").alias("neighbor_id"), "sub", "code", "cell"
        )

    codes = _stage_partitioned(
        spark, os.path.join(_STAGE_ROOT, f"ivfpq_codes_{key}"), build_codes, "cell"
    )
    return codes, cent


@query(
    "sim_ivf_staged_pq",
    oracle="WITH " + _IVF_CTES + "," + _pq_ctes() + """
SELECT query_id, neighbor_id, approx_cosine FROM (
  SELECT query_id, neighbor_id, approx_cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY approx_cosine DESC, neighbor_id) AS rn
  FROM pqscored
) WHERE rn <= 3
""",
)
def sim_ivf_staged_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_ivf_truepq` served from the PERSISTED index — the two
    demonstrated scale devices composed into the production ANN
    shape: PQ codes (8 bytes/vector, `ivf_pq_staged_layout`)
    directory-partitioned by coarse cell, so a probe partition-prunes
    the file source to n_probe/n_cells of an index that is ALSO 32x
    smaller than the fp corpus — pruning multiplies with compression.
    Query time reads NO full-precision corpus vector at all: the
    probed cells' code files stream against two broadcast tables (the
    per-query ADC lookup table and the codeword sqnorm table), and
    the approximate cosine folds through the same DECIMAL-exact sums
    as the in-query build — hash-identical to `sim_ivf_truepq`'s
    oracle, so the driver verdict proves the staged path returns
    bit-equal answers to the transient one. The fp rerank stage
    (sim_ivf_truepq_rerank) composes on top unchanged: at 100 TB the
    shortlist's full vectors come from the fp layout
    (`ivf_staged_layout`), also cell-pruned.

    100 TB shape: index build (train + encode + partitioned write) is
    the one-time ingest cost; per query the scan is bounded by probed
    partitions x 8 bytes/vector, both join sides are broadcast
    constants (8x256 LUT, 8x256 sqnorms), and the only shuffle is the
    map-side-combined (query, neighbor) ADC sum."""
    codes, cent = ivf_pq_staged_layout(spark, sf_dir)
    cent_n = ivf_staged_centroids(spark, sf_dir)
    e = load_spread(spark, sf_dir, "embeddings")
    qn0 = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .transform(track)  # probe window + LUT + norms all read it
    )
    probes = _ivf_probes(qn0, cent_n).select("query_id", "cell")
    # bounded collect: distinct probed cell ids, <= the cell domain
    cells = [r[0] for r in probes.select("cell").distinct().collect()]
    qsub = _pq_subvectors(qn0.select("vec_id", "v"))
    lut, cw = _adc_tables(cent, qsub)
    qnrm = qn0.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("qnrm"))
    cand_codes = codes.where(F.col("cell").isin(cells)).join(  # pruned scan
        F.broadcast(probes), "cell"
    )
    scored = _adc_fold(cand_codes, lut, cw, qnrm)
    w = W.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "approx_cosine")
    )


# ---------------------------------------------------------- binary quantization
#: Hamming candidate pool and final reranked size for the binary-
#: quantized search tier.
BQ_CANDIDATES = 50
BQ_TOP = 10
#: query-by-example vector (the retrieval family's convention).
BQ_QUERY_VEC = 0


def _bq_pack_sql(half: int) -> str:
    lo = half * 32
    return (
        f"list_sum(list_transform(generate_series(0, 31), i -> "
        f"CASE WHEN v[i + {lo + 1}] > 0 THEN (1::BIGINT << i) "
        f"ELSE 0 END))"
    )


@query(
    "sim_binary_quantized",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
packed AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         {_bq_pack_sql(0)} AS blo,
         {_bq_pack_sql(1)} AS bhi
  FROM e
),
q AS (SELECT v, nrm, blo, bhi FROM packed WHERE vec_id = {BQ_QUERY_VEC}),
ham AS (
  SELECT p.vec_id, p.v, p.nrm,
         (bit_count(xor(p.blo, q.blo)) + bit_count(xor(p.bhi, q.bhi)))
           ::BIGINT AS hamming
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> {BQ_QUERY_VEC}
),
cand AS (
  SELECT * FROM ham
  QUALIFY row_number() OVER (ORDER BY hamming, vec_id) <= {BQ_CANDIDATES}
),
rer AS (
  SELECT c.vec_id, c.hamming,
         round(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), 8) AS cosine
  FROM cand c CROSS JOIN q
  QUALIFY row_number() OVER (ORDER BY cosine DESC, vec_id) <= {BQ_TOP}
),
exact AS (
  SELECT p.vec_id
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> {BQ_QUERY_VEC}
  QUALIFY row_number() OVER (
    ORDER BY round(list_dot_product(p.v, q.v) / (p.nrm * q.nrm), 8) DESC,
             p.vec_id) <= {BQ_TOP}
),
rec AS (
  SELECT round(count(*)::DOUBLE / {BQ_TOP}, 4) AS recall_at_k
  FROM rer JOIN exact USING (vec_id)
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id)::BIGINT AS rank,
       vec_id, hamming, cosine,
       (SELECT recall_at_k FROM rec) AS recall_at_k
FROM rer
""",
)
def sim_binary_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized embedding search — the modern serving stack's
    cheapest tier (sign-bit quantization with Hamming-distance
    candidate generation and float rerank, the scheme production
    vector stores ship as "binary quantization"): each 64-d vector
    packs to TWO 32-bit sign masks (two BIGINT halves, so neither
    engine's signed arithmetic can overflow), candidates are the
    {BQ_CANDIDATES} nearest by Hamming distance — one xor+bit_count
    per comparison, a 32x memory cut and branch-free integer math —
    and the final top-{BQ_TOP} is exact cosine over the candidates.
    The result carries its own quality verdict: recall_at_k against
    the exact full-precision top-{BQ_TOP}, computed identically on
    both engines, so the driver hash pins the packing, the Hamming
    tier, the rerank, AND the measured recall in one row set.

    100 TB shape: the corpus pass for candidates touches only
    (vec_id, two longs) — the packed index is ~1/32 the fp corpus
    and scan-speed bound; the TakeOrdered candidate fold is
    mergeable; rerank and recall run on candidate-sized relations
    against the one broadcast query row. The sign masks would be a
    persisted index column at ingest (the `sim_ivf_staged` layout
    precedent); here they are computed in the scan projection so the
    oracle pins the packing arithmetic itself."""
    e = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )

    def pack(half: int) -> F.Column:
        lo = half * 32
        return F.expr(
            f"aggregate(sequence(0, 31), 0L, (acc, i) -> "
            f"acc + IF(element_at(v, i + {lo + 1}) > CAST(0 AS DOUBLE), "
            f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
        )

    packed = e.select(
        "vec_id",
        "v",
        _norm(F.col("v")).alias("nrm"),
        pack(0).alias("blo"),
        pack(1).alias("bhi"),
    ).transform(track)  # query row + Hamming scan + exact pass read it
    q = packed.filter(F.col("vec_id") == BQ_QUERY_VEC).select(
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("blo").alias("qlo"),
        F.col("bhi").alias("qhi"),
    )
    ham = (
        packed.filter(F.col("vec_id") != BQ_QUERY_VEC)
        .crossJoin(F.broadcast(q))  # one query row
        .select(
            "vec_id",
            "v",
            "nrm",
            "qv",
            "qnrm",
            (
                F.bit_count(F.col("blo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("bhi").bitwiseXOR(F.col("qhi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    cand = ham.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(BQ_CANDIDATES)
    cos = F.round(
        _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 8
    )
    rer = (
        cand.select("vec_id", "hamming", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(BQ_TOP)
        .transform(track)  # rank window + recall join both read it
    )
    exact = (
        packed.filter(F.col("vec_id") != BQ_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("c"))
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(BQ_TOP)
        .select("vec_id")
    )
    rec = rer.join(exact, "vec_id").agg(
        F.round(F.count(F.lit(1)).cast("double") / BQ_TOP, 4).alias(
            "recall_at_k"
        )
    )
    # global-ok: candidate-list-sized (top-BQ_TOP after a mergeable
    # TakeOrdered limit), never corpus-sized
    wrank = W.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rer.select(
            # (rank window runs over the BQ_TOP-row reranked list)
            # mergeable TakeOrdered limit), never corpus-sized
            F.row_number().over(wrank).cast("long").alias("rank"),
            "vec_id",
            "hamming",
            "cosine",
        )
        .crossJoin(F.broadcast(rec))  # 1-row verdict scalar
    )


#: every DELTA_MOD-th corpus vector arrives in the "today" batch of
#: the incremental-index exhibit (~14% of the corpus).
DELTA_MOD = 7


@query(
    "sim_ivf_incremental",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
tr AS (
  SELECT * FROM e WHERE vec_id >= {N_QUERIES} AND vec_id % {DELTA_MOD} != 0
),
dims AS (
  SELECT label, u.d, u.x
  FROM tr, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d,
                           unnest(v) AS x) u
),
cent AS (
  SELECT label AS cell, list(c ORDER BY d) AS cv
  FROM (SELECT label, d,
               CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        FROM dims GROUP BY label, d)
  GROUP BY label
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
),
idx AS (
  SELECT vec_id, cell, (vec_id % {DELTA_MOD} = 0) AS from_delta FROM (
    SELECT n.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, cent.cv)
                      / (n.nrm * sqrt(list_sum(list_transform(cent.cv, x -> x*x))))
                      DESC, cent.cell) AS rn
    FROM n CROSS JOIN cent WHERE n.vec_id >= {N_QUERIES}
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, cent.cv)
                      / (n.nrm * sqrt(list_sum(list_transform(cent.cv, x -> x*x))))
                      DESC, cent.cell) AS rn
    FROM n CROSS JOIN cent WHERE n.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
)
SELECT query_id, neighbor_id, cosine, from_delta FROM (
  SELECT p.vec_id AS query_id, i.vec_id AS neighbor_id,
         round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) AS cosine,
         i.from_delta,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY round(list_dot_product(qn.v, cn_.v) / (qn.nrm * cn_.nrm), 8) DESC,
                    i.vec_id) AS rn
  FROM probes p
  JOIN idx i ON i.cell = p.cell
  JOIN n qn  ON qn.vec_id = p.vec_id
  JOIN n cn_ ON cn_.vec_id = i.vec_id
) WHERE rn <= 3
""",
)
def sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the growing-segment
    pattern every production vector store uses (FAISS ``IndexIVF.add``
    after ``train``, Milvus growing segments, Lucene HNSW segment
    merges): when today's embedding batch arrives you do NOT retrain
    the quantizer or touch the existing index — the coarse centroids
    stay FROZEN (trained on the base corpus only), the new batch is
    assigned to cells with one broadcast pass over ITSELF, and it
    serves immediately as a delta segment unioned under the same
    probes; compaction into the partitioned layout
    (`ivf_staged_layout`) happens offline on its own schedule.

    Fixture split: every {DELTA_MOD}-th corpus vector is "today's
    arrivals" (~14%); the quantizer trains on the other ~86%. Result
    rows carry ``from_delta`` so the hash itself pins that fresh
    vectors are served (and a pytest pins they appear among the
    neighbors). The only corpus-wide relations are the base build —
    exactly what the staged deployment amortizes to build-once.

    100 TB shape: the incremental step costs O(|delta| x cells) via
    a broadcast nested loop over the tiny frozen centroid relation —
    the base corpus is NEVER rescanned, re-shuffled, or re-sorted on
    ingest (the whole point; re-assigning 100 TB per daily batch is
    the anti-pattern). Queries pay one union of a delta segment that
    is small by construction between compactions. Assignment argmins
    are per-row expressions over the literal frozen quantizer (r14),
    same as every IVF tier here."""
    is_corpus = F.col("vec_id") >= N_QUERIES
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    n, cent_n = _ivf_base(spark, sf_dir, train_filter=is_corpus & ~is_delta)
    # THE incremental step (r14 spelling): the FROZEN quantizer —
    # trained on the base only — is cell-domain-sized and served as a
    # literal, so assignment is one projection per segment; the delta
    # branch still scans only the arrivals (pushed filter) in a real
    # ingest, and the base corpus is never re-shuffled or re-joined.
    # Both segments fall out of the same pass here with from_delta
    # flagging the arrivals (the union of two identical projections,
    # fused).
    qrows = _quantizer_rows(cent_n)
    idx = n.filter(is_corpus).selectExpr(
        "vec_id",
        "v",
        "nrm",
        f"{_assign_cell_sql(qrows)} AS cell",
        f"(vec_id % {DELTA_MOD} = 0) AS from_delta",
    )
    probes = _ivf_probes(n.filter(F.col("vec_id") < N_QUERIES), cent_n, qrows)
    cand = idx.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")),
            8,
        ).alias("cosine"),
        "from_delta",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine", "from_delta")
    )


#: retrain gate for the composed index-maintenance capstone: if the
#: cosine between the base corpus's and the delta batch's per-dimension
#: ENERGY profiles (second-moment vectors) falls below this, the
#: arrivals no longer look like the distribution the quantizer was
#: trained on and the index must be rebuilt. (Centroid-direction cosine
#: — `quality_embedding_drift`'s signal — is noise for a zero-centered
#: cloud; the energy profile is stable under same-distribution sampling
#: at every fixture SF: 0.986-0.997 measured, so 0.95 separates cleanly.)
MAINT_COS_FLOOR = 0.95

#: shared SQL for the maintenance gate + both assignment branches
_MAINT_CTES = f"""
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
corpus AS (SELECT * FROM e WHERE vec_id >= {N_QUERIES}),
xx AS (
  SELECT CASE WHEN vec_id % {DELTA_MOD} = 0 THEN 1 ELSE 0 END AS grp, u.d, u.x
  FROM corpus, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d,
                               unnest(v) AS x) u
),
m2 AS (
  SELECT grp, d,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS e2
  FROM xx GROUP BY grp, d
),
gate AS (
  SELECT CAST(sum(CAST(a.e2 * b.e2 AS DECIMAL(38,18))) AS DOUBLE)
         / (sqrt(CAST(sum(CAST(a.e2 * a.e2 AS DECIMAL(38,18))) AS DOUBLE))
            * sqrt(CAST(sum(CAST(b.e2 * b.e2 AS DECIMAL(38,18))) AS DOUBLE)))
         AS dc
  FROM (SELECT * FROM m2 WHERE grp = 0) a
  JOIN (SELECT * FROM m2 WHERE grp = 1) b ON a.d = b.d
),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
)
"""


def _maint_cent_sql(train_pred: str) -> str:
    """Per-label coarse-centroid CTE body over ``corpus`` rows
    satisfying ``train_pred`` — the quantizer-train twin of
    ``_ivf_base``'s, parameterized by the training population."""
    return f"""(
  SELECT label AS cell, list(c ORDER BY d) AS cv
  FROM (SELECT label, d,
               CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        FROM (SELECT label, u.d, u.x
              FROM corpus, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d,
                                           unnest(v) AS x) u
              WHERE {train_pred})
        GROUP BY label, d)
  GROUP BY label
)"""


def _maint_assign_sql(cent_cte: str, rows_pred: str) -> str:
    """Nearest-cell assignment of ``n`` rows satisfying ``rows_pred``
    against ``cent_cte`` — the SQL twin of ``hash_argmin`` over the
    broadcast centroid relation."""
    return f"""(
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, cent.cv)
                      / (n.nrm * sqrt(list_sum(list_transform(cent.cv, x -> x*x))))
                      DESC, cent.cell) AS rn
    FROM n CROSS JOIN {cent_cte} cent
    WHERE n.vec_id >= {N_QUERIES} AND ({rows_pred})
  ) WHERE rn = 1
)"""


def _maintenance_drift(spark: SparkSession, sf_dir: str) -> float:
    """The gate scalar: cosine between base and delta per-dimension
    energy profiles. One corpus scan with (2 x dims) state, folded to
    a single row — the collect is a bounded 1-row control-plane read
    (the MMR / scalar-verdict precedent), never corpus-sized."""
    e = load_spread(spark, sf_dir, "embeddings")
    # r15 (guide §2.3, the _ivf_base device): was posexplode(DIMx) ->
    # groupBy(grp, d) — a 64-fold row explosion through a keyed
    # exchange. One groupBy(grp) carrying DIM decimal-sum buffers is
    # bit-identical (exact order-free DECIMAL sums of the same
    # products, same per-dim division) and folds map-side to 2 rows;
    # the (grp, d, e2) shape is rebuilt from the 2-row result so the
    # profile-cosine arithmetic below is untouched.
    x0 = e.filter(F.col("vec_id") >= N_QUERIES).select(
        (F.col("vec_id") % DELTA_MOD == 0).cast("int").alias("grp"),
        _as_double("embedding").alias("v"),
    )
    dims = range(1, DIM + 1)
    sums_sql = (
        "named_struct('n', count(1), "
        + ", ".join(
            f"'s{d}', sum(cast(element_at(v, {d}) * element_at(v, {d})"
            " as decimal(38,18)))"
            for d in dims
        )
        + ")"
    )
    e2s_sql = (
        "array("
        + ", ".join(f"(cast(_a.s{d} as double) / _a.n)" for d in dims)
        + ") AS e2s"
    )
    m2 = (
        x0.groupBy("grp")
        .agg(F.expr(sums_sql).alias("_a"))
        .selectExpr("grp", e2s_sql)
        .select("grp", F.posexplode("e2s").alias("d", "e2"))
    )
    a = m2.where(F.col("grp") == 0).select("d", F.col("e2").alias("a2"))
    b = m2.where(F.col("grp") == 1).select("d", F.col("e2").alias("b2"))
    row = (
        a.join(b, "d")
        .agg(
            (
                F.sum((F.col("a2") * F.col("b2")).cast("decimal(38,18)")).cast(
                    "double"
                )
                / (
                    F.sqrt(
                        F.sum(
                            (F.col("a2") * F.col("a2")).cast("decimal(38,18)")
                        ).cast("double")
                    )
                    * F.sqrt(
                        F.sum(
                            (F.col("b2") * F.col("b2")).cast("decimal(38,18)")
                        ).cast("double")
                    )
                )
            ).alias("dc")
        )
        .collect()
    )
    return float(row[0]["dc"])


def _maintenance_assign(
    spark: SparkSession, sf_dir: str, retrain: bool
) -> DataFrame:
    """The two physical branches of the maintenance decision.

    ``retrain=False`` (the common day): the quantizer stays FROZEN —
    trained on the base corpus only, exactly `sim_ivf_incremental`'s
    device — and assignment scans ONLY the delta batch (pushed
    ``vec_id % {DELTA_MOD}`` filter): O(|delta| x cells) work, the
    base index untouched.

    ``retrain=True`` (the drift day): the quantizer retrains on the
    FULL corpus (base + delta) and every corpus vector is re-assigned
    — the corpus-sized rebuild, paid only when the gate fires."""
    is_corpus = F.col("vec_id") >= N_QUERIES
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    train = is_corpus if retrain else (is_corpus & ~is_delta)
    n, cent_n = _ivf_base(spark, sf_dir, train_filter=train)
    rows = is_corpus if retrain else (is_corpus & is_delta)
    # r14: assignment is one projection over the literal quantizer
    # (see _assign_cell_sql) — the assigned population never expands,
    # shuffles, or aggregates.
    qrows = _quantizer_rows(cent_n)
    return n.filter(rows).selectExpr(
        "vec_id", f"{_assign_cell_sql(qrows)} AS cell"
    )


@query(
    "sim_index_maintenance",
    oracle=f"""
WITH {_MAINT_CTES}
SELECT f.vec_id, f.cell, round(g.dc, 6) AS drift_cosine,
       FALSE AS retrain_required
FROM {_maint_assign_sql(_maint_cent_sql(f"vec_id % {DELTA_MOD} != 0"), f"vec_id % {DELTA_MOD} = 0")} f,
     gate g
WHERE g.dc >= {MAINT_COS_FLOOR}
UNION ALL
SELECT r.vec_id, r.cell, round(g.dc, 6) AS drift_cosine,
       TRUE AS retrain_required
FROM {_maint_assign_sql(_maint_cent_sql("TRUE"), "TRUE")} r,
     gate g
WHERE g.dc < {MAINT_COS_FLOOR}
""",
)
def sim_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity family's composed capstone (r13 verdict #8):
    drift-gated index maintenance — the daily decision loop of a
    production vector store, under ONE oracle. The delta batch (every
    {DELTA_MOD}-th corpus vector, `sim_ivf_incremental`'s fixture)
    arrives; the gate computes the cosine between base and delta
    per-dimension ENERGY profiles (a one-scan drift monitor in the
    `quality_embedding_drift` family — the vector-space alarm that an
    embedding-model rev rotated/rescaled the space); and the engine
    takes exactly one branch:

      * gate >= {MAINT_COS_FLOOR} (no drift — the common day): the
        quantizer stays FROZEN, only the delta batch is assigned
        (O(|delta| x cells)); output is the delta segment's
        (vec_id, cell) rows.
      * gate < {MAINT_COS_FLOOR} (drift): full retrain — centroids
        recomputed over base+delta and EVERY corpus vector
        re-assigned; output is corpus-sized.

    Every row carries (drift_cosine, retrain_required), so the
    driver's value hash pins that BOTH engines computed the same gate
    scalar AND took the same branch — the oracle spells the decision
    as a gate-predicated UNION of the two branches. The Spark side
    branches in Python on a 1-row collected scalar (bounded
    control-plane; the MMR precedent) so only the taken branch's plan
    is ever BUILT: `tests/test_plans.py` pins that the no-drift plan
    assigns only delta rows and trains nothing on the full corpus,
    and the retrain branch is pytest-driven with a perturbed gate
    (`tests/test_llm.py`).

    100 TB shape: the gate is one corpus scan folding to (2 x dims)
    state — map-side-combined, nothing corpus-sized moves; the common
    day then touches only the arrivals (the whole point of the
    ladder: `sim_ivf_incremental` serves the delta, this query
    decides WHEN that stops being sound); the corpus-sized rebuild is
    paid exactly when the monitor says the frozen geometry is stale —
    the retrain-vs-delta economics, encoded."""
    dc = _maintenance_drift(spark, sf_dir)
    retrain = not (dc >= MAINT_COS_FLOOR)
    assign = _maintenance_assign(spark, sf_dir, retrain)
    return assign.select(
        "vec_id",
        "cell",
        F.round(F.lit(dc), 6).alias("drift_cosine"),
        F.lit(retrain).alias("retrain_required"),
    )
