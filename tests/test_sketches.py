"""Mergeable-sketch family: estimator invariants the math guarantees
(count-min never undercounts, Bloom never false-negatives) plus the
plan shapes that make the sketches 100 TB-safe (constant-size states
broadcast to the probe side, no cartesian anywhere, no Python eval)."""

from pyspark.sql import functions as F

from aws_etl_pipeline_spark.operators.sketches import (
    sketch_bloom_membership,
    sketch_countmin_heavyhitters,
    sketch_kmv_distinct,
    sketch_theta_intersect,
)
from aws_etl_pipeline_spark.plans.explain import plan_string, python_eval_nodes


def test_cms_never_undercounts_and_collides(spark, sf_dir):
    rows = sketch_countmin_heavyhitters(spark, sf_dir).collect()
    assert len(rows) == 31  # full corpus vocabulary
    assert all(r.never_undercounts for r in rows)
    assert all(r.cms_est >= r.exact_n for r in rows)
    # w=16 over a 31-term vocabulary forces collisions: the one-sided
    # error must actually be visible, not vacuously zero.
    assert any(r.cms_est > r.exact_n for r in rows)


def test_bloom_guarantees(spark, sf_dir):
    rows = sketch_bloom_membership(spark, sf_dir).collect()
    assert {r.c_mktsegment for r in rows} >= {"BUILDING"}
    # no false negatives, ever — the Bloom contract.
    assert all(r.n_false_negatives == 0 for r in rows)
    for r in rows:
        if r.c_mktsegment == "BUILDING":
            assert r.n_bloom_hits >= r.n_members


def test_kmv_estimator_within_bound(spark, sf_dir):
    rows = sketch_kmv_distinct(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r.within_bound for r in rows)
    assert all(r.kmv_est > 0 for r in rows)


def test_theta_intersect_consistent(spark, sf_dir):
    row = sketch_theta_intersect(spark, sf_dir).collect()[0]
    assert row.exact_inter <= row.exact_union
    assert row.est_union > 0 and row.est_inter >= 0
    # sampled-intersection estimate can never exceed the union estimate
    assert row.est_inter <= row.est_union + 1e-9


def test_sketch_plans_are_scale_safe(spark, sf_dir):
    """The probe sides join against constant-size sketch states: the
    join must be broadcast, never cartesian, and the whole family stays
    JVM-side (no Python eval nodes)."""
    for q in (sketch_countmin_heavyhitters, sketch_bloom_membership):
        df = q(spark, sf_dir)
        plan = plan_string(df)
        assert "BroadcastHashJoin" in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert python_eval_nodes(df) == [], q.__name__


def test_theta_fold_is_takeordered(spark, sf_dir):
    """The k-smallest union sample must be the mergeable
    TakeOrderedAndProject fold, not a global-sort window."""
    plan = plan_string(sketch_theta_intersect(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_stream_sketch_merge_equals_batch_sketch(spark, sf_dir):
    """The cross-micro-batch merged KMV state must yield the identical
    estimate to the single-pass batch sketch — merge split-invariance,
    checked end-to-end through real Structured Streaming."""
    from aws_etl_pipeline_spark.streaming.ingest import stream_exec_sketch_merge

    streamed = stream_exec_sketch_merge(spark, sf_dir).collect()[0]
    batch = sketch_theta_intersect(spark, sf_dir).collect()[0]
    assert streamed.asDict() == batch.asDict()


def test_histogram_quantiles_error_bound(spark, sf_dir):
    """Every histogram quantile must land within one bin width of the
    exact percentile — the construction's guarantee, also hash-pinned
    as verdict columns."""
    from aws_etl_pipeline_spark.operators.sketches import (
        sketch_histogram_quantiles,
    )

    rows = sketch_histogram_quantiles(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50_within_bin and r.p90_within_bin and r.p99_within_bin


def test_dp_counts_are_noised_but_close(spark, sf_dir):
    from aws_etl_pipeline_spark.operators.sketches import (
        DP_EPS,
        privacy_dp_count_laplace,
    )

    rows = privacy_dp_count_laplace(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.dp_n != r.true_n  # noise actually applied
        # Lap(1/eps) tail: P(|noise| > 20/eps) ~ 2e-9 — deterministic
        # seed makes this a fixed fact of the dataset, not flaky.
        assert abs(r.dp_n - r.true_n) < 20.0 / DP_EPS
        assert r.noise_magnitude > 0


def test_dp_quantile_released_bin_is_plausible(spark, sf_dir):
    """Exponential-mechanism DP median: the released bin must be a
    valid grid cell, the TRUE bin must be the exact percentile_disc
    bin of the histogram, and with eps=1 and hundreds of rows per
    segment the released bin should land within a few bins of truth
    (the seeded Gumbel draw makes this deterministic, so the bound is
    a hard assertion, not a flaky one)."""
    from aws_etl_pipeline_spark.operators.sketches import (
        DPQ_BINS,
        privacy_dp_quantile,
    )

    rows = privacy_dp_quantile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dp_bin"] < DPQ_BINS
        assert 0 <= r["true_bin"] < DPQ_BINS
        assert r["bin_error"] == abs(r["dp_bin"] - r["true_bin"])
        # utility falls by eps/2 per COUNT of rank distance, so the
        # tolerable miss shrinks as rows per bin grow: at the sf0.001
        # fixture (n~25/segment, sparse histogram) Gumbel noise can
        # move the release several near-empty bins; in the hundreds
        # (sf0.01+) a miss beyond a handful has probability exp(-tens).
        # Deterministic seed -> hard assertion either way, not flaky.
        assert r["bin_error"] <= (5 if r["n"] >= 200 else 12), r
