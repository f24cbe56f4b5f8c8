"""Geo family: blocking completeness, plan shape, and grid invariants."""

import re

from pyspark.sql import functions as F

from aws_etl_pipeline_spark.operators.geo import (
    _PAIR_DIST,
    RADIUS_KM,
    _customer_points,
    _hub_points,
    geo_grid_density,
    geo_nearest_hub,
    geo_radius_join,
)
from aws_etl_pipeline_spark.plans.explain import plan_string, python_eval_nodes


def _brute_force_pairs(spark, sf_dir):
    """Reference pair set: unblocked cross join + the same rounded
    radius predicate. O(n*m) — test-only."""
    pts = _customer_points(spark, sf_dir)
    hubs = _hub_points(spark, sf_dir)
    dist = F.round(F.expr(_PAIR_DIST), 2)
    return (
        pts.crossJoin(hubs)
        .select("c_custkey", "hub_key", dist.alias("dist_km"))
        .where(F.col("dist_km") <= RADIUS_KM)
    )


def test_radius_blocking_is_complete(spark, sf_dir):
    """The 3x3 cell neighborhood must lose NO pair vs brute force —
    the correctness contract of grid blocking."""
    blocked = {
        (r.c_custkey, r.hub_key, r.dist_km)
        for r in geo_radius_join(spark, sf_dir).collect()
    }
    brute = {
        (r.c_custkey, r.hub_key, r.dist_km)
        for r in _brute_force_pairs(spark, sf_dir).collect()
    }
    assert blocked == brute


def test_radius_join_plan_no_cartesian(spark, sf_dir):
    df = geo_radius_join(spark, sf_dir)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert python_eval_nodes(df) == []


def test_nearest_hub_agrees_with_radius_join(spark, sf_dir):
    nearest = {r.c_custkey: r for r in geo_nearest_hub(spark, sf_dir).collect()}
    pts = _customer_points(spark, sf_dir)
    assert len(nearest) == pts.count()  # every customer assigned
    for r in geo_radius_join(spark, sf_dir).collect():
        # nearest distance can never exceed any in-radius pair's distance
        assert nearest[r.c_custkey].nearest_km <= r.dist_km
    for n in nearest.values():
        if n.nearest_km <= 1000.0:
            assert n.n_within_1000 >= 1


def test_nearest_hub_single_shuffle(spark, sf_dir):
    """Broadcast 25x expansion collapsed by ONE hash-agg shuffle:
    exactly one Exchange in the plan, and its input is the partial
    aggregate (map-side combine), not the expanded relation."""
    df = geo_nearest_hub(spark, sf_dir)
    plan = plan_string(df)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "CartesianProduct" not in plan  # broadcast NLJ, never CP
    # min(struct) aggregates via SortAggregate; the partial instance
    # must sit BELOW the Exchange (map-side combine).
    nodes = [
        l.split(") ", 1)[1].strip()
        for l in plan.splitlines()
        if re.match(r"^\(\d+\)", l)
    ]
    agg_idx = [i for i, n in enumerate(nodes) if "Aggregate" in n]
    exch_idx = nodes.index("Exchange")
    assert min(agg_idx) < exch_idx < max(agg_idx)


def test_grid_density_partitions_everyone(spark, sf_dir):
    rows = geo_grid_density(spark, sf_dir).collect()
    pts = _customer_points(spark, sf_dir)
    assert sum(r.n_customers for r in rows) == pts.count()
    for r in rows:
        assert 0 <= r.cell_lat < 24 and 0 <= r.cell_lon < 72


def test_hotspot_clusters_contract(spark, sf_dir):
    from aws_etl_pipeline_spark.operators.geo import geo_hotspot_clusters

    rows = geo_hotspot_clusters(spark, sf_dir).collect()
    assert rows, "clustered synthesis must produce hot cells at any SF"
    by_cluster = {}
    for r in rows:
        assert r.cluster_size >= 1
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, cells in by_cluster.items():
        assert len(cells) == cells[0].cluster_size
        # the label is the min cell id of the member set (within the
        # fixed propagation radius): it must belong to the cluster
        ids = {c.cell_lat * 72 + c.cell_lon for c in cells}
        assert cid == min(ids)
        # every member within a cluster is 8-connected to some other
        # member (no isolated cell may share a propagated label)
        if len(cells) > 1:
            for c in cells:
                assert any(
                    abs(c.cell_lat - o.cell_lat) <= 1
                    and abs(c.cell_lon - o.cell_lon) <= 1
                    and (c.cell_lat, c.cell_lon) != (o.cell_lat, o.cell_lon)
                    for o in cells
                )
