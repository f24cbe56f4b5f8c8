"""Feature-engineering encodings: leakage exclusion, IV arithmetic,
and the two-scan-no-wide-shuffle plan contract."""

import math
import re

from aws_etl_pipeline_spark.operators.features import (
    TE_SMOOTH_M,
    feature_target_encode_loo,
    feature_woe_iv,
)
from aws_etl_pipeline_spark.plans.explain import plan_string, python_eval_nodes


def test_loo_excludes_own_label(spark, sf_dir):
    rows = feature_target_encode_loo(spark, sf_dir).collect()
    assert rows
    # reconstruct category stats locally and check the LOO arithmetic
    n_cat, y_cat = {}, {}
    for r in rows:
        n_cat[r.o_orderpriority] = n_cat.get(r.o_orderpriority, 0) + 1
        y_cat[r.o_orderpriority] = y_cat.get(r.o_orderpriority, 0) + r.y
    total_n = sum(n_cat.values())
    prior = sum(y_cat.values()) / total_n
    for r in rows[:200]:
        c = r.o_orderpriority
        expect = (y_cat[c] - r.y + TE_SMOOTH_M * prior) / (
            n_cat[c] - 1 + TE_SMOOTH_M
        )
        assert abs(r.te_loo - round(expect, 6)) < 1e-9
    # two rows in one category with different labels MUST differ —
    # that difference is the leave-one-out exclusion doing its job
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r.o_orderpriority, set()).add((r.y, r.te_loo))
    for pairs in by_cat.values():
        if len({y for y, _ in pairs}) == 2:
            encs = {e for _, e in pairs}
            assert len(encs) == 2


def test_woe_iv_consistency(spark, sf_dir):
    rows = feature_woe_iv(spark, sf_dir).collect()
    assert len(rows) == 5
    iv_totals = {r.iv_total for r in rows}
    assert len(iv_totals) == 1  # same total on every row
    total = iv_totals.pop()
    assert abs(total - round(sum(r.iv_term for r in rows), 6)) < 1e-6
    for r in rows:
        # IV terms are non-negative by construction: sign(ps-ns) == sign(woe)
        assert r.iv_term >= -1e-12
        assert math.isfinite(r.woe)


def test_encodings_avoid_category_shuffle(spark, sf_dir):
    """The big side must never be shuffled by the 5-value category:
    every Exchange in the plan is either broadcast or hashes the
    pre-aggregated stats side, and no Python touches the hot path."""
    for fn in (feature_target_encode_loo, feature_woe_iv):
        df = fn(spark, sf_dir)
        plan = plan_string(df)
        assert python_eval_nodes(df) == []
        # no shuffle Exchange may carry o_orderkey-grain data keyed by
        # the category: the only hashpartitioning allowed on
        # o_orderpriority is under a HashAggregate (the 5-row stats agg)
        for m in re.finditer(r"Exchange hashpartitioning\(o_orderpriority", plan):
            ctx = plan[max(0, m.start() - 400) : m.start()]
            assert "HashAggregate" in ctx


def test_quantile_normalize_equalizes_distributions(spark, sf_dir):
    """r12: after QN every metric must carry the IDENTICAL value
    multiset (the definition of quantile normalization), each
    metric's internal ordering must be preserved (qn is monotone in
    the original value), and every rank's reference value is the
    cross-metric mean at that rank."""
    from aws_etl_pipeline_spark.operators.features import (
        feature_quantile_normalize,
    )

    rows = feature_quantile_normalize(spark, sf_dir).collect()
    assert rows
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r.metric, []).append(r)
    assert set(by_metric) == {"qty", "revenue", "n_items"}
    dists = {
        m: sorted(r.qn_value for r in rs) for m, rs in by_metric.items()
    }
    vals = list(dists.values())
    assert vals[0] == vals[1] == vals[2]
    for m, rs in by_metric.items():
        rs = sorted(rs, key=lambda r: r.rk)
        for a, b in zip(rs, rs[1:]):
            assert a.orig_value <= b.orig_value, (m, a, b)
            assert a.qn_value <= b.qn_value, (m, a, b)
