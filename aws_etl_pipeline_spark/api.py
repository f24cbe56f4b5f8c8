"""Public operator API — the engine's reusable surface.

The named queries in ``__spark_entry__.py`` pin these operators to
fixed parameters for the DuckDB correctness gate; this module is what
an application actually imports. Everything takes and returns plain
DataFrames, composes lazily, and follows the conventions documented in
SCALING.md (codegen-first, equi-join candidate generation, blocking
keys for pairwise work).

    from aws_etl_pipeline_spark import api

    dups      = api.minhash_lsh_pairs(docs, "doc_id", "text")
    keepers   = api.exact_dedup(docs, "doc_id", text_col="text")
    neighbors = api.topk_cosine(corpus, queries, "vec_id", "embedding", k=5)
    scored    = api.text_statistics(docs, "doc_id", "text")
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .cache import track
from .operators.etl import (  # noqa: F401  (re-exported reference-parity ops)
    amount_category_expr,
    run_pipeline,
    transform_transactions,
    write_csv,
    write_json,
    write_parquet,
)
from .operators.upsert import merge_into_parquet, merge_upsert  # noqa: F401

# 31-bit universal-hash modulus (fits BIGINT products on any engine).
_P = 2_147_483_647


def _perm_constants(n: int) -> list[tuple[int, int]]:
    out = []
    for k in range(n):
        a = int(hashlib.md5(f"a{k}".encode()).hexdigest()[:8], 16) % (_P - 1) + 1
        b = int(hashlib.md5(f"b{k}".encode()).hexdigest()[:8], 16) % _P
        out.append((a, b))
    return out


def _words(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), " ")


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str | None = None, keys: list[str] | None = None
) -> DataFrame:
    """Exact dedup groups: by normalized content hash (``text_col``) or
    by explicit key columns. Returns (group key, keeper id = min id,
    n_copies). Only hashes shuffle, never payloads."""
    if text_col is not None:
        keyed = df.select(
            id_col, F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_md5")
        )
        group = ["content_md5"]
    else:
        keyed = df.select(id_col, *(keys or []))
        group = list(keys or [])
    return keyed.groupBy(*group).agg(
        F.min(id_col).alias(f"keeper_{id_col}"), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows via posexplode + window lead — fully codegen,
    clamped n-grams at the tail (see SCALING.md: interpreted array
    lambdas are ~5x slower per core)."""
    words = df.select(
        id_col, F.posexplode(_words(text_col)).alias("pos", "w")
    )
    win = W.partitionBy(id_col).orderBy("pos")
    parts = ["w"] + [F.lead("w", i).over(win) for i in range(1, n)]
    return words.select(id_col, F.concat_ws(" ", *parts).alias("s"))


def passage_rows(
    df: DataFrame, id_col: str, text_col: str, window: int = 12, stride: int = 6
) -> DataFrame:
    """(id, start_pos, passage) rows: FULL sliding word-windows of
    ``window`` words every ``stride`` positions (1-based starts 1,
    1+stride, ...; tail windows shorter than ``window`` are dropped,
    unlike shingle_rows' clamping — a repeated PASSAGE must be
    whole-width to count). Same codegen posexplode + window-lead
    spelling as shingle_rows; the per-doc window shuffle carries
    (id, pos, word) rows, never full documents."""
    words = df.select(id_col, F.posexplode(_words(text_col)).alias("pos", "w"))
    win = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, window)]
    return (
        words.select(
            id_col,
            (F.col("pos") + 1).alias("start_pos"),
            F.concat_ws(" ", *parts).alias("passage"),
            # full-width iff the last word of the window exists
            F.lead("w", window - 1).over(win).isNotNull().alias("_full"),
        )
        .filter(F.col("_full") & ((F.col("start_pos") - 1) % stride == 0))
        .drop("_full")
    )


def passage_dedup(
    df: DataFrame, id_col: str, text_col: str, window: int = 12, stride: int = 6
) -> DataFrame:
    """Cross-document repeated-passage detection (the distributable
    form of exact-substring dedup a suffix array computes single-node:
    Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): hash every full ``window``-word passage at
    ``stride`` offsets, group by the 16-byte hash, and report every
    passage seen more than once with its occurrence/document counts
    and the keeper (lowest id). Like exact_dedup, only hashes shuffle
    in the groupBy — never passages or documents — so at 100 TB the
    reduce state is one (hash, counts) row per *distinct repeated*
    passage, which tracks duplication density, not corpus size."""
    p = passage_rows(df, id_col, text_col, window, stride)
    return (
        p.select(id_col, F.md5(F.col("passage").cast("binary")).alias("passage_md5"))
        .groupBy("passage_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias(f"keeper_{id_col}"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, shingle: int = 3
) -> DataFrame:
    """Per-document minhash signature columns mh0..mh{n-1}: one md5 per
    shingle, then ``n_hashes`` universal-hash permutations folded as
    codegen'd conditional mins in a single groupBy."""
    perms = _perm_constants(n_hashes)
    rows = shingle_rows(df, id_col, text_col, shingle)
    h = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long") % _P
    return (
        rows.select(id_col, h.alias("h"))
        .groupBy(id_col)
        .agg(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"mh{k}")
                for k, (a, b) in enumerate(perms)
            ]
        )
    )


def _lsh_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    n_bands: int,
    shingle: int,
    include_sig: bool,
) -> DataFrame:
    """(id[, sig], band_idx, band_hash) rows — the banded-minhash
    bucket table under every LSH candidate join. Persisted: Catalyst
    does not reuse the two identical self-join subtrees (verified: 2
    parquet scans, no ReusedExchange), so without this the shingle ->
    minhash pipeline — the expensive half on a real corpus — runs
    twice. persist() keeps lineage for executor-loss recovery, unlike
    localCheckpoint."""
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle)
    sig_cols = (
        [F.array(*[F.col(f"mh{k}") for k in range(n_hashes)]).alias("sig")]
        if include_sig
        else []
    )
    banded = sig.select(
        id_col,
        *sig_cols,
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh{k}")
                        for k in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    stack_args = ", ".join(f"{b}, band{b}" for b in range(n_bands))
    band_rows = banded.selectExpr(
        id_col,
        *(["sig"] if include_sig else []),
        f"stack({n_bands}, {stack_args}) AS (band_idx, band_hash)",
    )
    return band_rows.transform(track)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs with estimated Jaccard: banded
    minhash signatures, candidates from an equi-join on (band index,
    band hash) — never an OR-of-bands nested loop. Output columns:
    ``{id}_a, {id}_b, est_jaccard``."""
    band_rows = _lsh_band_rows(
        df, id_col, text_col, n_hashes, n_bands, shingle, include_sig=True
    )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    agreement = F.aggregate(
        F.zip_with(
            F.col("a.sig"), F.col("b.sig"), lambda x, y: F.when(x == y, 1).otherwise(0)
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
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col[:3]}_a" if id_col.endswith("_id") else "id_a"),
            F.col(f"b.{id_col}").alias(f"{id_col[:3]}_b" if id_col.endswith("_id") else "id_b"),
            F.round(agreement / float(n_hashes), 6).alias("est_jaccard"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.05,
    shingle: int = 3,
    measure: str = "jaccard",
) -> DataFrame:
    """Exact shingle-set similarity for pairs sharing ``block_col`` —
    the recall oracle for LSH; the blocking key bounds the pair count.
    ``measure``: 'jaccard' (intersection over union) or 'containment'
    (overlap coefficient, intersection over the SMALLER set — catches
    a short document quoted inside a longer one, where the union
    denominator dilutes toward 0). The score column is named after the
    measure."""
    # materialized token COLUMN, not the split() expression — a lambda
    # closing over an expression re-evaluates it per element_at (the
    # r9 text_boilerplate_ngrams lesson, ~(shingle)x re-splits per
    # position when violated)
    ws = F.col("_ws")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(ws)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + off).cast("int")) for off in range(shingle)]
        ),
    )
    # persist: the shingle pipeline feeds both self-join sides (Catalyst
    # does not reuse the common subtree).
    t = (
        df.select(id_col, block_col, _words(text_col).alias("_ws"))
        .select(id_col, block_col, F.array_distinct(shingles).alias("sh"))
        .transform(track)
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    if measure == "jaccard":
        denom = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    elif measure == "containment":
        denom = F.least(F.size(F.col("a.sh")), F.size(F.col("b.sh")))
    else:
        raise ValueError(f"unknown measure: {measure!r}")
    score = inter.cast("double") / denom
    return (
        # corpus x corpus candidate join: NEVER broadcast-eligible —
        # plan-time size estimates derive from the compressed file and
        # under-count exploded band/shingle relations by 100x+ (the r10
        # 1000x replica broadcast a 4 GB side and blew maxResultSize);
        # the hint pins a shuffle join regardless of estimates.
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(score >= threshold)
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col[:3]}_a" if id_col.endswith("_id") else "id_a"),
            F.col(f"b.{id_col}").alias(f"{id_col[:3]}_b" if id_col.endswith("_id") else "id_b"),
            F.round(score, 6).alias(measure),
        )
    )


def containment_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Containment (overlap-coefficient) pairs with LSH-bucket
    candidate generation — the 100 TB spelling of ``jaccard_pairs(
    measure='containment')``: candidates come from the banded-minhash
    bucket equi-join (same-bucket docs only, cost tracks duplicate
    density, not n²), and ONLY those pairs get the exact
    shingle-set containment score ``|A∩B| / min(|A|,|B|)``.

    Recall caveat, stated honestly: the buckets are minhash-JACCARD
    buckets, so a containment pair whose Jaccard is tiny (a short doc
    quoted inside a vastly longer one) may never share a bucket. The
    length-blocked exact ``jaccard_pairs`` remains the recall oracle;
    a production subset-robust candidate step signs the SHORTER side's
    passages instead (dedup_substring's windows) so the quoted block
    itself collides."""
    band_rows = _lsh_band_rows(
        df, id_col, text_col, n_hashes, n_bands, shingle, include_sig=False
    )
    ia, ib = (
        (f"{id_col[:3]}_a", f"{id_col[:3]}_b")
        if id_col.endswith("_id")
        else ("id_a", "id_b")
    )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
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
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias(ia), F.col(f"b.{id_col}").alias(ib))
        .distinct()
    )
    ws = F.col("_ws")  # materialized column (r9 expression-closure lesson)
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(ws)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + off).cast("int")) for off in range(shingle)]
        ),
    )
    sh = (
        df.select(id_col, _words(text_col).alias("_ws"))
        .select(id_col, F.array_distinct(shingles).alias("sh"))
        .transform(track)
    )
    ta = sh.select(F.col(id_col).alias(ia), F.col("sh").alias("sh_a"))
    tb = sh.select(F.col(id_col).alias(ib), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    score = inter.cast("double") / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        cand.hint("shuffle_hash").join(ta, ia)
        .hint("shuffle_hash").join(tb, ib)
        .filter(score >= threshold)
        .select(ia, ib, F.round(score, 6).alias("containment"))
    )


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """Connected components of an undirected edge list by iterative
    min-label propagation: every node starts labeled with its own id;
    each round a node adopts the smallest label among itself and its
    neighbors. Returns ``(node, component_id)`` where ``component_id``
    is the smallest node id in the component.

    Converges in O(graph diameter) rounds; each round is one shuffle
    join on the node id plus a map-side-combined min aggregation, and
    ``localCheckpoint`` truncates lineage so the plan stays flat across
    iterations. Convergence is detected by the (monotone decreasing)
    sum of labels going flat — one cheap aggregation per round instead
    of a change-count self-join. At 100 TB the same loop holds (the
    label table is two longs per node, no payload columns move); for
    high-diameter graphs switch the round body to large-star /
    small-star, which squares the propagation distance per round.
    """
    # checkpoint the RAW pair list before symmetrizing: union's two
    # branches are planned independently, so symmetrize-then-checkpoint
    # ran the (expensive) edge-generation plan twice (measured 2x on
    # dedup_connected_components at sf0.1, r8)
    # r15: checkpoints are LAZY — each round's convergence collect is
    # the materializing action, so a round costs ONE job instead of an
    # eager checkpoint job plus the collect (the graph_hits device).
    base = edges.select(
        F.col(src).alias("n"), F.col(dst).alias("m")
    ).localCheckpoint(eager=False)
    sym = base.union(
        base.select(F.col("m").alias("n"), F.col("n").alias("m"))
    ).localCheckpoint(eager=False)  # reads the base checkpoint; keeps rounds flat
    lbl = (
        sym.select("n")
        .distinct()
        .select("n", F.col("n").alias("cid"))
        .localCheckpoint(eager=False)
    )
    prev_sum = object()
    for _ in range(max_iter):
        nbr = (
            sym.join(lbl.select(F.col("n").alias("m"), "cid"), "m")
            .groupBy("n")
            .agg(F.min("cid").alias("nbr_cid"))
        )
        lbl = (
            lbl.join(nbr, "n", "left")
            .select("n", F.least("cid", F.coalesce("nbr_cid", "cid")).alias("cid"))
            .localCheckpoint(eager=False)
        )
        label_sum = lbl.agg(F.sum(F.col("cid").cast("decimal(30,0)"))).collect()[0][0]
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    else:
        # exhausted max_iter without the label sum going flat: the
        # graph's diameter exceeds the round budget, and returning the
        # un-converged labels would be a SILENT wrong answer (labels
        # above the component minimum, canonical-rule violations
        # downstream). Verify with one more neighbor pass and fail
        # loudly if any label could still shrink.
        nbr = (
            sym.join(lbl.select(F.col("n").alias("m"), "cid"), "m")
            .groupBy("n")
            .agg(F.min("cid").alias("nbr_cid"))
        )
        if not lbl.join(nbr, "n").filter(F.col("nbr_cid") < F.col("cid")).isEmpty():
            raise RuntimeError(
                f"connected_components: not converged after {max_iter} "
                "rounds (component diameter exceeds the round budget); "
                "raise max_iter or use connected_components_star, whose "
                "star rounds square the propagation distance"
            )
    return lbl.select(F.col("n").alias("node"), F.col("cid").alias("component_id"))


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 12
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the high-diameter complement to
    :func:`connected_components`: min-label propagation needs
    O(diameter) rounds, which is fine for near-dup clusters (tiny
    diameters) but pathological for chain-shaped corpus graphs; the
    star rounds contract paths doubly-exponentially and converge in
    O(log^2 n) rounds REGARDLESS of diameter.

    Per round (each one shuffle-join + one min-agg, same unit cost as
    a propagation round; edge set never grows beyond the input):

    * large-star(u): m = min(N(u) + {u}); emit (v, m) for v in N(u),
      v > u  — hooks every larger neighbor to the center's minimum.
    * small-star(u): edges oriented (larger -> smaller), m = min(N(u));
      emit (x, m) for x in N(u) + {u}, x != m — contracts each center's
      smaller neighborhood onto its minimum.

    Convergence when a full LS+SS round leaves the edge multiset
    unchanged (detected by the (count, sum(u), sum(v)) triple — one
    cheap agg per round, the label-sum device from
    ``connected_components``); at the fixed point the edges form stars
    (child, component-min). Returns ``(node, component_id)``.
    """
    # one checkpoint of the input edge list: `nodes` and `e` both
    # derive from it, and edge GENERATION (a jaccard_pairs plan here)
    # is usually far more expensive than anything in the rounds —
    # deriving them from the raw plan re-ran pair generation twice
    # (measured 93 s -> the propagation variant's level after this fix)
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    # full node universe BEFORE dropping self-loops: a node appearing
    # only as (n, n) is a singleton component, not a non-node
    nodes = raw.select("u").union(raw.select(F.col("v").alias("u"))).distinct()
    e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    prev_sig = object()
    for _ in range(max_iter):
        # large-star over the symmetrized adjacency
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        e = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the (larger -> smaller) orientation
        ori = (
            e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins = ori.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            ori.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        sig = tuple(
            e.agg(
                F.count(F.lit(1)),
                F.sum(F.col("u").cast("decimal(30,0)")),
                F.sum(F.col("v").cast("decimal(30,0)")),
            ).collect()[0]
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    labels = e.union(e.select(F.col("v").alias("u"), F.col("v")).distinct()).distinct()
    return nodes.join(
        labels.select(F.col("u"), F.col("v").alias("cid")), "u", "left"
    ).select(
        F.col("u").alias("node"), F.coalesce("cid", F.col("u")).alias("component_id")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-document SimHash fingerprint (word-level md5 bit votes).

    All ``bits`` bit-votes are summed as separate conditional
    aggregates in ONE doc-keyed groupBy (the minhash_signatures
    discipline) — the earlier spelling crossJoined the word stream
    with range(bits), expanding the first shuffle x``bits`` and paying
    a second shuffle to re-group by doc (round-4 advice). Map-side
    combine reduces each partition to one ``bits``-wide row per doc
    before anything hits the wire."""
    words = df.select(id_col, F.explode(_words(text_col)).alias("w"))
    hashed = words.select(
        id_col, F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h")
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"w{k}")
            for k in range(bits)
        ]
    )
    fingerprint = None
    for k in range(bits):
        term = F.when(F.col(f"w{k}") > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(id_col, fingerprint.alias("simhash"))


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_to: int = 8,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector: broadcast the
    query side, one scoring pass over the corpus, one top-k window.
    Output: query_id, neighbor_id, cosine."""
    as_double = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731

    def normed(df: DataFrame, prefix: str) -> DataFrame:
        v = as_double(vec_col)
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias(f"{prefix}_v")
        ).withColumn(f"{prefix}_nrm", _norm(F.col(f"{prefix}_v")))

    q = normed(queries, "query")
    c = normed(corpus, "neighbor")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("query_v"), F.col("neighbor_v"))
            / (F.col("query_nrm") * F.col("neighbor_nrm")),
            round_to,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id (as a bit string) for a double-array
    column against fixed hyperplanes."""
    parts = []
    for row in planes:
        lit = F.array(*[F.lit(x) for x in row])
        parts.append(F.when(_dot(vec_col, lit) > 0, "1").otherwise("0"))
    return F.concat(*parts)


def stable_sample(df: DataFrame, key_col: str, pct: int, salt: str = "salt42") -> DataFrame:
    """Deterministic ~pct% sample via a salted md5 bucket of the key —
    identical across runs, engines, and partitionings (df.sample is
    not)."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col))), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    return df.filter(bucket < pct)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


def text_statistics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token/char statistics per document (see llm/text.py text_stats
    for the verified fixed-parameter form)."""
    ws = _words(text_col)
    return df.select(
        id_col,
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct_words"),
        F.round(
            F.aggregate(
                F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
            ).cast("double")
            / F.size(ws),
            6,
        ).alias("avg_word_len"),
        F.round(F.size(F.array_distinct(ws)).cast("double") / F.size(ws), 6).alias(
            "type_token_ratio"
        ),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content md5 + 60-bit projection + shard bucket."""
    norm = F.lower(F.trim(F.col(text_col)))
    h = F.md5(norm)
    fp60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return df.select(
        id_col, h.alias("content_md5"), fp60.alias("fp60"), (fp60 % 1024).alias("fp_bucket")
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Exact TF-IDF top-k terms per document (corpus size as a
    broadcast scalar, no driver-side count).

    Shuffle-minimal shape: the exploded word stream is reduced ONCE to
    the (doc, term, tf) relation (map-side partial agg), and document
    frequency is then a window count over tf partitioned by term — tf
    is already distinct per (doc, term), so ``count(*) over term`` ==
    ``count(DISTINCT doc)`` — replacing a second full pass + shuffle
    over the raw words and a countDistinct expand with one pass over
    the much smaller tf relation. Word-level data crosses the wire
    once; everything after is tf-sized."""
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    words = df.select(id_col, F.explode(_words(text_col)).alias("term"))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_w = W.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 8
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tfidf")
    )


# --------------------------------------------------------------------------
# As-of join
# --------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, the latest right row with right.ts < left.ts
    (``strict``; <= otherwise) within the same ``by`` key — as one
    window pass over the unioned stream: single shuffle on ``by``, no
    per-key join, no candidate blow-up (SCALING.md Joins). Right value
    columns come back as ``asof_<col>``.

    Tie handling: at equal timestamps, ``strict`` orders left rows
    before right rows (the equal-ts right row is NOT visible), non-
    strict the reverse.
    """
    l_aligned = left.select(
        by,
        ts_col,
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
        *[c for c in left.columns if c not in (by, ts_col)],
    )
    r_aligned = right.select(
        by,
        ts_col,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (by, ts_col)
        ],
    )
    unioned = l_aligned.unionByName(r_aligned)
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        W.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__side") == 1).drop(
        "__side", *[f"__v_{c}" for c in value_cols]
    )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` each, optionally re-clustering on ``sort_col``.

    The small-files problem is the classic failure mode of streaming /
    per-event ingest (the reference writes ONE object per Lambda
    invocation — `lambda_function.py:274-305` — which at 100 TB would
    mean billions of KB-sized objects and a metadata-bound scan). The
    file count is sized from the actual input bytes, so the operation
    is idempotent and scale-free; with ``sort_col`` the rewrite is a
    ``repartitionByRange`` (disjoint spans, footer-prunable), without
    it a plain ``coalesce`` (no shuffle at all). Returns the number of
    files written."""
    fs_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(fs_path).getLength()
    n_files = max(1, int(total_bytes // (target_file_mb * 1024 * 1024)) + 1)
    df = spark.read.parquet(src_path)
    if sort_col is not None:
        df = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(dst_path)
    out = spark._jvm.org.apache.hadoop.fs.Path(dst_path)
    return sum(
        1
        for s in fs.listStatus(out)
        if s.getPath().getName().endswith(".parquet")
    )


def _spread_bits16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit int
    (the classic Morton-code magic-mask cascade) — pure codegen'd
    bitwise expressions, no UDF."""
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


def zorder_key(a: Column, b: Column) -> Column:
    """Interleave two 16-bit-normalized ints into one Morton (Z-order)
    key: locality in the key ≈ locality in BOTH source dimensions."""
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, n_partitions: int
) -> DataFrame:
    """Two-dimensional Z-order clustering: normalize both columns to
    0..65535 against their global min/max (one tiny broadcast agg),
    interleave bits into a Morton key, and range-partition + sort on
    it. Each output file then covers a bounded RECTANGLE in
    (col_a, col_b) space — so parquet footer min/max prunes scans
    filtered on EITHER column, where single-key sorting prunes only
    its own column. This is the layout Delta/Iceberg `OPTIMIZE ZORDER
    BY` produces, built from the same bitwise primitives as
    `fn_bitwise`. The clustering claim is asserted quantitatively in
    tests/test_api.py."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    )
    with_b = df.join(F.broadcast(bounds))

    def norm(c: str, lo: str, hi: str) -> Column:
        # double arithmetic before the multiply: (col - lo) * 65535 in
        # 32-bit ints overflows silently (ANSI off) once the column span
        # exceeds ~32k, garbling the Morton keys at real scale.
        span = (F.col(hi) - F.col(lo)).cast("double")
        return F.when(span == 0, F.lit(0)).otherwise(
            ((F.col(c) - F.col(lo)).cast("double") * 65535 / span).cast("int")
        )

    keyed = with_b.withColumn(
        "__zkey", zorder_key(norm(col_a, "a_lo", "a_hi"), norm(col_b, "b_lo", "b_hi"))
    ).drop("a_lo", "a_hi", "b_lo", "b_hi")
    return (
        keyed.repartitionByRange(n_partitions, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
