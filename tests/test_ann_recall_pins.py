"""Oracle-pinned recall floors for the ANN ladder (r8 verdict #7).

SCALING.md's ANN recall tables were produced by inline computation —
a recall regression there would only go stale in a doc. This pins each
tier's recall@3 against the exact brute-force baseline AT sf0.01 (the
documented measurement scale) so a regression flips a test, not a
paragraph. Floors sit one notch below the measured values
(lsh 0.467, ivf/sq8/rerank 0.433, truepq ADC 0.367, brp-mllib 1.0,
r9 measurement) — loose enough to absorb corpus-regeneration jitter,
tight enough that a bucket-geometry or quantizer bug (the r4 8-bit
single-probe cliff measured 0.03) fails loudly.

Also pins the ladder's structural invariant: full-precision reranking
can never score below the ADC shortlist it reranks.
"""

import os
from collections import defaultdict

import pytest

SF01 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.01 testdata not present"
)

#: (query name, recall@3 floor at sf0.01)
FLOORS = [
    ("sim_lsh_ann", 0.40),
    ("sim_ivf_ann", 0.40),
    ("sim_ivf_sq8", 0.40),
    ("sim_ivf_sq8_rerank", 0.40),
    ("sim_ivf_truepq", 0.30),
    ("sim_ivf_truepq_rerank", 0.40),
    ("sim_brp_lsh_mllib", 0.90),
]


@pytest.fixture(scope="module")
def recalls(spark):
    """One pass: exact top-3 ground truth, then every tier's recall."""
    from aws_etl_pipeline_spark.cache import clear_persisted
    from aws_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    rows = qs["sim_bruteforce_topk"].fn(spark, SF01).collect()
    clear_persisted()
    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append((-r.cosine, r.neighbor_id))
    exact = {(q, nid) for q, lst in per.items() for _, nid in sorted(lst)[:3]}
    n_queries = len(per)
    out = {}
    for name, _ in FLOORS:
        got = {
            (r.query_id, r.neighbor_id)
            for r in qs[name].fn(spark, SF01).collect()
        }
        clear_persisted()
        out[name] = len(got & exact) / (3 * n_queries)
    return out


@pytest.mark.parametrize("name,floor", FLOORS)
def test_ann_recall_floor(recalls, name, floor):
    assert recalls[name] >= floor, (
        f"{name} recall@3 {recalls[name]:.3f} fell below pinned floor "
        f"{floor} — ANN geometry or quantizer regression "
        f"(see SCALING.md ANN recall tables)"
    )


def test_rerank_never_below_adc(recalls):
    """Reranking the ADC shortlist with full-precision vectors can only
    fix ranking mistakes inside the shortlist, never create new misses."""
    assert recalls["sim_ivf_truepq_rerank"] >= recalls["sim_ivf_truepq"]
    assert recalls["sim_ivf_sq8_rerank"] >= recalls["sim_ivf_sq8"]


def test_staged_pq_equals_inquery_truepq(spark, sf_dir):
    """The staged-PQ index must return BIT-EQUAL answers to the
    transient in-query build — codes and codebooks round-trip through
    parquet ints/doubles exactly, so any divergence is a staging bug,
    not quantization noise."""
    from aws_etl_pipeline_spark.llm.similarity import (
        sim_ivf_staged_pq,
        sim_ivf_truepq,
    )

    a = {
        (r["query_id"], r["neighbor_id"]): r["approx_cosine"]
        for r in sim_ivf_truepq(spark, sf_dir).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"]): r["approx_cosine"]
        for r in sim_ivf_staged_pq(spark, sf_dir).collect()
    }
    assert a == b and a


def test_binary_quantized_recall_and_packing(spark, sf_dir):
    """r12: the binary tier must be a real retrieval ladder rung — the
    recall verdict is a single consistent value, the packing halves
    are 32-bit clean (no sign bleed between halves), candidates are
    genuinely Hamming-ordered, and recall against the exact top-k
    clears the floor the 64-bit sign sketch earns on this corpus."""
    from aws_etl_pipeline_spark.llm.similarity import (
        BQ_TOP,
        sim_binary_quantized,
    )

    rows = sim_binary_quantized(spark, sf_dir).collect()
    assert len(rows) == BQ_TOP
    recs = {r.recall_at_k for r in rows}
    assert len(recs) == 1
    rec = recs.pop()
    assert 0.0 <= rec <= 1.0
    # sign-bit Hamming at 64 bits keeps a usable share of the exact
    # top-k on this corpus; pin a floor so a packing regression
    # (wrong bit, wrong half) fails loudly rather than shipping
    # recall ~0
    assert rec >= 0.3, rec
    for r in rows:
        assert 0 <= r.hamming <= 64, r
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks)
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_incremental_delta_contract(spark):
    """r13: the incremental-index invariants the hash can't see by
    itself — (a) from_delta is exactly the id-split predicate
    (vec_id % DELTA_MOD == 0), (b) delta vectors actually SERVE (at
    least one appears among the neighbors at sf0.01 — ~14% of the
    corpus is delta, 10 queries x 3 neighbors of it), and (c) the
    result is well-formed top-3 per query."""
    from collections import Counter

    from aws_etl_pipeline_spark.llm.similarity import (
        DELTA_MOD,
        N_QUERIES,
        sim_ivf_incremental,
    )

    rows = sim_ivf_incremental(spark, SF01).collect()
    per_q = Counter(r.query_id for r in rows)
    assert set(per_q) == set(range(N_QUERIES))
    assert all(c == 3 for c in per_q.values())
    for r in rows:
        assert r.from_delta == (r.neighbor_id % DELTA_MOD == 0), r
        assert r.neighbor_id >= N_QUERIES
    assert any(r.from_delta for r in rows), (
        "no delta vector served — the growing segment is invisible"
    )
