"""Public API (api.py): generic-operator behavior the fixed named
queries can't pin down — parameterization and the standalone asof_join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_spark import api


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_asof_join_strict_and_inclusive(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    trades = _events(
        spark,
        [
            (1, base, 7, 100.0),
            (2, base + dt.timedelta(minutes=5), 7, 101.0),
        ],
    ).select("event_id", "ts", "user_id")
    quotes = _events(
        spark,
        [
            (10, base - dt.timedelta(minutes=1), 7, 99.5),
            (11, base, 7, 99.9),  # equal-ts: excluded when strict
            (12, base + dt.timedelta(minutes=3), 7, 100.4),
            (13, base + dt.timedelta(minutes=9), 7, 100.9),  # future: never
        ],
    ).select("ts", "user_id", F.col("value").alias("quote"))

    strict = {
        r.event_id: r.asof_quote
        for r in api.asof_join(
            trades, quotes, "ts", "user_id", ["quote"], strict=True
        ).collect()
    }
    assert strict == {1: 99.5, 2: 100.4}

    incl = {
        r.event_id: r.asof_quote
        for r in api.asof_join(
            trades, quotes, "ts", "user_id", ["quote"], strict=False
        ).collect()
    }
    assert incl == {1: 99.9, 2: 100.4}


def test_asof_join_no_prior_right_row(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    trades = _events(spark, [(1, base, 7, 1.0)]).select("event_id", "ts", "user_id")
    quotes = _events(
        spark, [(10, base + dt.timedelta(minutes=1), 7, 9.0)]
    ).select("ts", "user_id", F.col("value").alias("quote"))
    row = api.asof_join(trades, quotes, "ts", "user_id", ["quote"]).first()
    assert row.asof_quote is None


def test_minhash_parameterization(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    # 2 rows/band: detection probability ~1 for jaccard ~0.5 pairs
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in api.minhash_lsh_pairs(
            docs, "doc_id", "text", n_hashes=32, n_bands=16
        ).collect()
    }
    # near-identical docs must surface as candidates; the unrelated one
    # must not pair with anything
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.3
    assert not any(3 in p for p in pairs)


def test_exact_dedup_by_keys(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0)], "id long, k string, v double"
    )
    out = {r.k: (r.keeper_id, r.n_copies) for r in api.exact_dedup(df, "id", keys=["k"]).collect()}
    assert out == {"a": (1, 2), "b": (3, 1)}


def test_topk_cosine_self_retrieval(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = api.topk_cosine(
        corpus=vecs.filter("vec_id > 1"), queries=vecs.filter("vec_id = 1"),
        id_col="vec_id", vec_col="embedding", k=1,
    ).collect()
    assert len(out) == 1 and out[0].neighbor_id == 2


def test_stable_sample_is_stable(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = sorted(r.doc_id for r in api.stable_sample(df, "doc_id", 20).collect())
    b = sorted(r.doc_id for r in api.stable_sample(df.repartition(7), "doc_id", 20).collect())
    assert a == b
    assert 100 < len(a) < 300  # ~20%


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=15),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.floats(0, 10, allow_nan=False)),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join == per-row 'max right.ts < left.ts' reference, for any
    keyed input (strict semantics; ts as integers for exact compare)."""
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, base + dt.timedelta(seconds=ts), k) for i, (k, ts) in enumerate(lefts)
    ]
    rrows = [
        (base + dt.timedelta(seconds=ts), k, v) for (k, ts, v) in rights
    ]
    left = spark.createDataFrame(lrows, "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(rrows, "ts timestamp, user_id long, quote double")
    got = {
        r.event_id: r.asof_quote
        for r in api.asof_join(left, right, "ts", "user_id", ["quote"]).collect()
    }
    for i, (k, lts) in enumerate(lefts):
        candidates = [
            (rts, v) for (rk, rts, v) in rights if rk == k and rts < lts
        ]
        # ties on right ts: our window keeps the LAST in (ts, side) order,
        # i.e. any of the max-ts values; accept any max-ts candidate
        if candidates:
            max_ts = max(c[0] for c in candidates)
            allowed = {v for (ts2, v) in candidates if ts2 == max_ts}
            assert got[i] in allowed, (i, got[i], allowed)
        else:
            assert got[i] is None


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # disjoint pair 10-11; node 20 appears only as an isolated self-edge
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 20)], "src long, dst long"
    )
    got = {
        (r.node, r.component_id)
        for r in api.connected_components(edges, "src", "dst").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20)}


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert api.connected_components(edges, "src", "dst").count() == 0
