"""Property-based spot checks (SURVEY §5.2): algebraic identities the
DuckDB oracle can't directly express, over generated inputs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # key
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=60,
)

COMMON = dict(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**COMMON)
@given(rows=ROWS)
def test_drop_duplicates_idempotent(spark, rows):
    df = spark.createDataFrame(rows or [(0, 0.0)], "k int, v float")
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert sorted(r.k for r in once.collect()) == sorted(r.k for r in twice.collect())
    assert once.count() == df.select("k").distinct().count()


@settings(**COMMON)
@given(rows=ROWS)
def test_union_all_count_additive(spark, rows):
    df = spark.createDataFrame(rows or [(0, 0.0)], "k int, v float")
    assert df.unionByName(df).count() == 2 * df.count()


@settings(**COMMON)
@given(rows=ROWS)
def test_except_then_intersect_partition(spark, rows):
    """distinct(A) splits exactly into (A∩B) ⊎ (A−B) for any B."""
    df = spark.createDataFrame(rows or [(0, 0.0)], "k int, v float").select("k")
    b = df.filter(F.col("k") % 2 == 0)
    inter = df.intersect(b)
    diff = df.subtract(b)
    assert inter.count() + diff.count() == df.distinct().count()
    assert inter.intersect(diff).count() == 0


@settings(**COMMON)
@given(rows=ROWS)
def test_decimal_sum_order_invariant(spark, rows):
    """The engine's exact-sum convention: identical totals under any
    repartitioning (the property plain float sums lack)."""
    df = spark.createDataFrame(rows or [(0, 0.0)], "k int, v float")
    s1 = df.agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("s")).first().s
    s2 = (
        df.repartition(7)
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("s"))
        .first()
        .s
    )
    assert s1 == s2


@settings(**COMMON)
@given(
    amounts=st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        min_size=1,
        max_size=40,
    )
)
def test_bucketize_total(spark, amounts):
    """Every row lands in exactly one bucket; null -> unknown."""
    from aws_etl_pipeline_spark.operators.etl import amount_category_expr

    df = spark.createDataFrame([(a,) for a in amounts], "amount float")
    out = df.select(amount_category_expr(F.col("amount").cast("double")).alias("c"))
    rows = [r.c for r in out.collect()]
    assert len(rows) == len(amounts)
    assert set(rows) <= {"unknown", "small", "medium", "large", "very_large"}
    assert rows.count("unknown") == sum(1 for a in amounts if a is None)


MERGE_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),  # key (small domain -> collisions)
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda r: r[0],  # key unique per side (R17 PK contract)
)


@settings(**COMMON)
@given(target=MERGE_ROWS, source=MERGE_ROWS, restrict=st.booleans())
def test_merge_upsert_matches_python_model(spark, target, source, restrict):
    """merge_upsert == the dict-model of MERGE INTO: matched keys take
    update_cols from source (explicit NULLs overwrite), unmatched
    source rows insert whole, unmatched target rows persist."""
    from aws_etl_pipeline_spark.operators.upsert import merge_upsert

    schema = "k int, amount int, note string"
    t = spark.createDataFrame(target, schema) if target else spark.createDataFrame([], schema)
    s = spark.createDataFrame(source, schema) if source else spark.createDataFrame([], schema)
    update_cols = ("amount",) if restrict else None
    got = {
        r.k: (r.amount, r.note)
        for r in merge_upsert(t, s, "k", update_cols=update_cols).collect()
    }

    model = {k: (a, n) for k, a, n in target}
    for k, a, n in source:
        if k in model:
            if restrict:
                model[k] = (a, model[k][1])  # only amount updates
            else:
                model[k] = (a, n)
        else:
            model[k] = (a, n)  # insert takes the whole source row
    assert got == model


WORD_DOCS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "ab", "x"]),  # tiny alphabet -> many repeats
        min_size=0,
        max_size=25,
    ),
    min_size=1,
    max_size=12,
)


@settings(**COMMON)
@given(docs=WORD_DOCS)
def test_repetition_fold_matches_python_model(spark, docs):
    """text_repetition's per-row sorted-run-length fold must equal the
    obvious Counter-based top-bigram count for any word stream,
    including 0/1-word documents (the sequence(1, n<1) descending
    trap) and all-identical streams."""
    from collections import Counter

    rows = [(i, " ".join(ws) if ws else "") for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the operator fn reads a parquet dir; exercise the identical fold
    # expression over a temp view of the same (doc_id, text) shape.
    df.createOrReplaceTempView("_prop_docs")
    got = spark.sql(
        """
        SELECT doc_id,
          CASE WHEN size(sorted_bg) < 2 THEN CAST(size(sorted_bg) AS LONG) ELSE
            aggregate(
              sequence(1, size(sorted_bg) - 1),
              named_struct('run', 1L, 'best', 1L),
              (acc, i) -> named_struct(
                'run', IF(sorted_bg[i] = sorted_bg[i - 1], acc.run + 1L, 1L),
                'best', greatest(acc.best,
                  IF(sorted_bg[i] = sorted_bg[i - 1], acc.run + 1L, 1L))),
              acc -> acc.best)
          END AS top_c
        FROM (
          SELECT doc_id, ws,
                 CASE WHEN size(ws) < 2 THEN array()
                      ELSE array_sort(transform(sequence(1, size(ws) - 1),
                                      i -> concat(ws[i - 1], ' ', ws[i])))
                 END AS sorted_bg
          FROM (SELECT doc_id, split(lower(trim(text)), ' ') AS ws
                FROM _prop_docs)
        )
        """
    ).collect()
    out = {r.doc_id: r.top_c for r in got}

    for i, ws in enumerate(docs):
        # split('') yields [''] — mirror the operator's word stream
        eff = " ".join(ws).lower().strip().split(" ")
        bgs = [f"{a} {b}" for a, b in zip(eff, eff[1:])]
        want = max(Counter(bgs).values()) if bgs else 0
        assert out[i] == want, (i, ws, out[i], want)


def test_mix_temperature_uniform_is_fixpoint(spark, sf_dir):
    """The driver fixture's source distribution is exactly uniform, and
    uniform is a fixpoint of temperature scaling at any alpha — so on
    this input p_temp must equal p_raw share-for-share (the gain/lose
    behavior is exercised on a non-uniform corpus below; a mean-based
    per-source assertion would be vacuous here AND unsound in general:
    the alpha=0.5 gain/lose crossover is 1/S^2 with S = sum sqrt(p_i),
    not the mean share)."""
    from aws_etl_pipeline_spark.llm.assembly import mix_temperature

    rows = mix_temperature(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.p_temp - r.p_raw) < 1e-6, r
    n_total = sum(r.n_docs for r in rows)
    assert abs(sum(r.expected_docs for r in rows) - n_total) <= len(rows)


def test_mix_temperature_flattens_skewed_corpus(spark, tmp_path):
    """On a genuinely skewed corpus, alpha<1 temperature scaling must
    (a) preserve the source ordering, (b) strictly shrink the max/min
    share ratio to its square root, and (c) make the SMALLEST source
    strictly gain share and the LARGEST strictly lose — the two
    guarantees that hold for every non-uniform distribution (p_min is
    always below the 1/S^2 crossover and p_max always above; sources
    in between may legitimately go either way)."""
    import math

    from aws_etl_pipeline_spark.llm.assembly import mix_temperature

    counts = {"big": 50, "mid": 34, "small": 16}
    rows = [
        (i, "alpha beta gamma", "en", src, 16)
        for i, src in enumerate(
            s for s, n in counts.items() for _ in range(n)
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.source: r for r in mix_temperature(spark, str(tmp_path)).collect()}
    assert set(out) == set(counts)
    assert abs(sum(r.p_temp for r in out.values()) - 1.0) < 1e-4
    # (a) order preserved
    assert out["big"].p_temp > out["mid"].p_temp > out["small"].p_temp
    # (b) ratio flattens to its square root (rounding tolerance)
    raw_ratio = out["big"].p_raw / out["small"].p_raw
    temp_ratio = out["big"].p_temp / out["small"].p_temp
    assert abs(temp_ratio - math.sqrt(raw_ratio)) < 1e-3
    # (c) extremes move toward the middle
    assert out["small"].p_temp > out["small"].p_raw
    assert out["big"].p_temp < out["big"].p_raw


SYM = st.text(alphabet="abc", min_size=1, max_size=2)
SYMS = st.lists(SYM, min_size=0, max_size=12)


@settings(**COMMON)
@given(syms=SYMS, a=SYM, b=SYM)
def test_bpe_merge_replace_matches_python_model(spark, syms, a, b):
    """bpe_train_merges applies a winning merge (a, b) with one
    engine-native replace() over the bracketed symbol string; that must
    equal the textbook greedy left-to-right non-overlapping BPE merge —
    including the overlap case (pair (a,a) on an 'aaa' run -> [aa, a])
    and never matching inside a longer symbol ('ab','b' untouched by
    pair (a,b)). Randomized symbol streams vs a pure-Python reference."""
    from aws_etl_pipeline_spark.llm.text import _BPE_C, _BPE_O

    def ref_merge(ss):
        out, i = [], 0
        while i < len(ss):
            if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(ss[i])
                i += 1
        return out

    wrapped = "".join(_BPE_O + s + _BPE_C for s in syms)
    pat = _BPE_O + a + _BPE_C + _BPE_O + b + _BPE_C
    rep = _BPE_O + a + b + _BPE_C
    df = spark.createDataFrame([(wrapped,)], "w string").select(
        F.replace(F.col("w"), F.lit(pat), F.lit(rep)).alias("w")
    )
    got = df.collect()[0].w
    want = "".join(_BPE_O + s + _BPE_C for s in ref_merge(syms))
    assert got == want, (syms, a, b, got, want)


# _pq_assign's distance expression is PQ_SUBDIM-wide by construction,
# so generated vectors must match that width exactly (feeding shorter
# arrays would make element_at return NULL — a misuse, not a bug;
# caught when this test's first draft did exactly that).
VEC_PQ = st.lists(
    st.floats(min_value=-8, max_value=8, allow_nan=False, width=16),
    min_size=8, max_size=8,
)


@settings(**COMMON)
@given(
    vecs=st.lists(VEC_PQ, min_size=1, max_size=5),
    cents=st.lists(VEC_PQ, min_size=1, max_size=4),
)
def test_pq_assign_matches_python_argmin(spark, vecs, cents):
    """_pq_assign's hash-aggregate min(struct(d2, cell)) must equal the
    textbook argmin with (distance asc, cell asc) tie-break — the
    struct-ordering trick replaced a row_number window for speed and
    this pins that the semantics survived. The Python model uses the
    identical left-associated IEEE double arithmetic (Python floats
    ARE doubles), so even near-tie orderings must agree exactly."""
    from aws_etl_pipeline_spark.llm.similarity import PQ_SUBDIM, _pq_assign

    assert PQ_SUBDIM == 8  # generator width is tied to the geometry
    sub = spark.createDataFrame(
        [(i, 0, v) for i, v in enumerate(vecs)],
        "vec_id long, sub int, sv array<double>",
    )
    cent = spark.createDataFrame(
        [(0, j, c) for j, c in enumerate(cents)],
        "sub int, cell int, cv array<double>",
    )
    got = {
        (r.vec_id, r.cell) for r in _pq_assign(sub, cent).collect()
    }

    def d2(v, c):
        acc = (v[0] - c[0]) * (v[0] - c[0])
        for k in range(1, PQ_SUBDIM):
            acc = acc + (v[k] - c[k]) * (v[k] - c[k])
        return acc

    want = {
        (i, min(range(len(cents)), key=lambda j: (d2(v, cents[j]), j)))
        for i, v in enumerate(vecs)
    }
    assert got == want, (got, want)
