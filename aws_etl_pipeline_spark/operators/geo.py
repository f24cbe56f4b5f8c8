"""Geospatial operators: grid-cell blocked distance joins and spatial
density aggregation (SURVEY §2B breadth — the spatial workload class).

A warehouse user of the reference's tier (store locations, delivery
radii, geo-fenced attribution downstream of `lambda_function.py:176`)
runs three canonical spatial shapes, and all three distribute the same
way at 100 TB:

* **Radius join** (which points fall within R km of which sites?) —
  NEVER a cross join. Both sides are keyed to a fixed lat/lon grid
  whose cell edge is chosen so that any two points within R km differ
  by at most one cell index per axis; the small side is expanded to
  its 3x3 cell neighborhood and the join becomes a plain EQUI-join on
  the cell key. Here the site side is tiny (25 hubs -> 225 neighbor
  rows), so Spark broadcasts it and the plan is scan -> broadcast
  hash join -> fused haversine filter: ZERO shuffle of the big side.
  For big-big spatial joins the identical cell-blocking turns into a
  shuffle equi-join on the cell key — same operator, same grid.
* **Nearest-neighbor assignment** (closest hub per point) — the 25-row
  hub relation rides a broadcast nested-loop expansion (25x) that is
  immediately collapsed by a hash aggregate keyed on the point; the
  partial (map-side) min(struct(dist, hub)) reduces each partition to
  one row per point BEFORE the only shuffle, so shuffle volume is
  |points|, not 25x|points|.
* **Grid density** (the heatmap) — one hash aggregate on the cell key.

Coordinates are synthesized deterministically from integer keys
(modular arithmetic, then one double division by 1000) because the
corpus has no geo columns — the fn_url precedent. Cell indices are
computed from the INTEGER milli-degrees (shifted non-negative, then
floor-divided), so blocking never depends on float rounding.

Cross-engine determinism: haversine needs sin/cos/asin/sqrt, whose
last ulp may differ between the JVM's Math and DuckDB's libm. The
discipline (events_survival_km precedent): both engines evaluate the
transcendentals on bit-identical double inputs (built from integer
arithmetic and literal constants — DEG2RAD is spelled as the same
64-bit literal on both sides, not each engine's radians()), and every
emitted/filtered distance is round()ed first; the radius predicate
compares the ROUNDED value so the pair set cannot disagree with the
reported distances.

Boundary (documented, not hit here): cell blocking as written does not
wrap longitude at the +/-180 antimeridian. Hub longitudes are
synthesized inside [-170, 169] and a pair spanning the 20-degree gap
would have to sit poleward of ~62 degrees to be within 300 km, where
no hub exists — verified impossible on this data. Production fix: also
emit each site shifted +/-360 degrees into the edge cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .relational import _davg, davg

__all__ = [
    "geo_grid_density",
    "geo_radius_join",
    "geo_nearest_hub",
    "geo_hotspot_clusters",
]

#: One 64-bit literal, spelled identically in the Spark expressions and
#: the DuckDB oracle text, so both engines feed sin/cos the same bits.
DEG2RAD = "0.017453292519943295"

#: Earth diameter in km (2 * 6371): haversine's leading constant.
EARTH_D = "12742.0"

#: Radius-join threshold (km) and grid edge (milli-degrees). 5 degrees
#: of latitude is ~556 km; 300 km spans at most 2.72 degrees of
#: latitude and, at the highest latitude any qualifying pair can reach
#: on this data (~52 deg, hub |lat| <= 49 + 300 km), at most 4.4
#: degrees of longitude — both under one cell edge, so the 3x3
#: neighborhood is a complete candidate set (no missed pairs).
RADIUS_KM = 300.0
CELL_MILLI = 5000

# --- deterministic coordinate synthesis (integer-exact, both engines) ---
# customer: lat in [-60, 60) milli-deg, lon in [-180, 180) milli-deg.
_C_LAT_MILLI = "((c_custkey * 7919) % 120000 - 60000)"
_C_LON_MILLI = "((c_custkey * 104729) % 360000 - 180000)"
# hub (nation): integer degrees, lat in [-50, 49], lon in [-170, 169].
_H_LAT_MILLI = "((n_nationkey * 37) % 100 * 1000 - 50000)"
_H_LON_MILLI = "((n_nationkey * 73) % 340 * 1000 - 170000)"


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Haversine km between two (milli-degree) coordinate expressions.

    Identical TEXT is used for the Spark side (F.expr) and the DuckDB
    oracle, so the double math is the same expression tree on both
    engines — the only cross-engine freedom left is libm's last ulp,
    absorbed by round(, 2) at every use site.
    """
    p1 = f"(({lat1}) / 1000.0 * {DEG2RAD})"
    p2 = f"(({lat2}) / 1000.0 * {DEG2RAD})"
    dp = f"((({lat2}) - ({lat1})) / 1000.0 * {DEG2RAD} / 2.0)"
    dl = f"((({lon2}) - ({lon1})) / 1000.0 * {DEG2RAD} / 2.0)"
    return (
        f"{EARTH_D} * asin(sqrt("
        f"sin({dp}) * sin({dp}) + cos({p1}) * cos({p2}) * sin({dl}) * sin({dl})"
        f"))"
    )


_CUST_PTS_SQL = f"""
  SELECT c_custkey,
         {_C_LAT_MILLI} AS lat_m,
         {_C_LON_MILLI} AS lon_m,
         CAST(floor(({_C_LAT_MILLI} + 60000) / {CELL_MILLI}) AS BIGINT) AS cell_lat,
         CAST(floor(({_C_LON_MILLI} + 180000) / {CELL_MILLI}) AS BIGINT) AS cell_lon,
         c_acctbal
  FROM customer
"""

_HUB_PTS_SQL = f"""
  SELECT n_nationkey AS hub_key, n_name AS hub_name,
         {_H_LAT_MILLI} AS hlat_m,
         {_H_LON_MILLI} AS hlon_m,
         CAST(floor(({_H_LAT_MILLI} + 60000) / {CELL_MILLI}) AS BIGINT) AS hcell_lat,
         CAST(floor(({_H_LON_MILLI} + 180000) / {CELL_MILLI}) AS BIGINT) AS hcell_lon
  FROM nation
"""


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lat_m = F.expr(_C_LAT_MILLI)
    lon_m = F.expr(_C_LON_MILLI)
    return cust.select(
        "c_custkey",
        lat_m.alias("lat_m"),
        lon_m.alias("lon_m"),
        F.floor((lat_m + 60000) / CELL_MILLI).alias("cell_lat"),
        F.floor((lon_m + 180000) / CELL_MILLI).alias("cell_lon"),
        "c_acctbal",
    )


def _hub_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    hlat = F.expr(_H_LAT_MILLI)
    hlon = F.expr(_H_LON_MILLI)
    return nat.select(
        F.col("n_nationkey").alias("hub_key"),
        F.col("n_name").alias("hub_name"),
        hlat.alias("hlat_m"),
        hlon.alias("hlon_m"),
        F.floor((hlat + 60000) / CELL_MILLI).alias("hcell_lat"),
        F.floor((hlon + 180000) / CELL_MILLI).alias("hcell_lon"),
    )


@query(
    "geo_grid_density",
    oracle=f"""
WITH pts AS ({_CUST_PTS_SQL})
SELECT cell_lat, cell_lon,
       count(*)::BIGINT AS n_customers,
       {_davg('c_acctbal')} AS avg_bal
FROM pts
GROUP BY 1, 2
""",
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid (the heatmap op): customers bucketed to
    5-degree lat/lon cells, one hash aggregate on the cell key.

    Cell indices come from integer milli-degrees (shift non-negative,
    floor-divide), so the grid is float-free. avg is DERIVED from a
    DECIMAL-exact sum / exact count (the agg_basic discipline) — never
    a float avg() whose merge order wiggles last bits. Scale: partial
    aggregation reduces each scan partition to |occupied cells| rows
    before the single shuffle; the grid is bounded (24 x 72 cells)
    regardless of corpus size.
    """
    pts = _customer_points(spark, sf_dir)
    return pts.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        davg("c_acctbal").alias("avg_bal"),
    )


_PAIR_DIST = _haversine_sql("lat_m", "lon_m", "hlat_m", "hlon_m")


@query(
    "geo_radius_join",
    oracle=f"""
WITH pts AS ({_CUST_PTS_SQL}),
hubs AS ({_HUB_PTS_SQL}),
hub_cells AS (
  SELECT h.*, hcell_lat + d1.dlat AS jcell_lat, hcell_lon + d2.dlon AS jcell_lon
  FROM hubs h
  CROSS JOIN (VALUES (-1), (0), (1)) d1(dlat)
  CROSS JOIN (VALUES (-1), (0), (1)) d2(dlon)
),
cand AS (
  SELECT p.c_custkey, h.hub_key, h.hub_name,
         round({_PAIR_DIST}, 2) AS dist_km
  FROM pts p JOIN hub_cells h
    ON p.cell_lat = h.jcell_lat AND p.cell_lon = h.jcell_lon
)
SELECT c_custkey, hub_key, hub_name, dist_km
FROM cand WHERE dist_km <= {RADIUS_KM}
""",
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell blocked radius join: every (customer, hub) pair within
    300 km, with NO cross join anywhere in the plan.

    The hub side is expanded to its 3x3 cell neighborhood (25 hubs ->
    225 rows — still broadcast-sized) and the join is a plain equi-join
    on (cell_lat, cell_lon); the 5-degree cell edge makes the
    neighborhood a complete candidate set for 300 km (proof in the
    module docstring), so blocking loses no pairs. Haversine runs only
    on candidates and is fused into the join's output projection; the
    radius predicate compares the round(,2) distance so both engines
    keep the identical pair set. Plan at this hub count: scan ->
    broadcast hash join -> filter, zero big-side shuffle. Big-big
    variant: the same cell key becomes a shuffle equi-join — the
    operator is the grid, not the broadcast.
    """
    pts = _customer_points(spark, sf_dir)
    hubs = _hub_points(spark, sf_dir)
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    hub_cells = (
        hubs.withColumn("dlat", F.explode(offs))
        .withColumn("dlon", F.explode(offs))
        .select(
            "hub_key",
            "hub_name",
            "hlat_m",
            "hlon_m",
            (F.col("hcell_lat") + F.col("dlat")).alias("jcell_lat"),
            (F.col("hcell_lon") + F.col("dlon")).alias("jcell_lon"),
        )
    )
    cand = pts.join(
        F.broadcast(hub_cells),
        (pts.cell_lat == hub_cells.jcell_lat) & (pts.cell_lon == hub_cells.jcell_lon),
    ).select(
        "c_custkey",
        "hub_key",
        "hub_name",
        F.round(F.expr(_PAIR_DIST), 2).alias("dist_km"),
    )
    return cand.where(F.col("dist_km") <= RADIUS_KM)


@query(
    "geo_nearest_hub",
    oracle=f"""
WITH pts AS ({_CUST_PTS_SQL}),
hubs AS ({_HUB_PTS_SQL}),
scored AS (
  SELECT p.c_custkey, h.hub_key,
         round({_PAIR_DIST}, 2) AS dist_km
  FROM pts p CROSS JOIN hubs h
)
SELECT c_custkey, hub_key AS nearest_hub, dist_km AS nearest_km,
       n_within_1000
FROM (
  SELECT c_custkey, hub_key, dist_km,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist_km, hub_key) AS rn,
         sum(CASE WHEN dist_km <= 1000.0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY c_custkey)::BIGINT AS n_within_1000
  FROM scored
) WHERE rn = 1
""",
)
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment: closest of the 25 hubs per customer plus
    the count of hubs within 1000 km (coverage redundancy).

    The hub relation is broadcast, the 25x expansion is collapsed by a
    hash aggregate keyed on c_custkey whose partial (map-side) combine
    runs BEFORE the shuffle — shuffle volume is one row per customer,
    not 25x. Nearest = min over the LONG-packed key
    round(dist_km*100)*10000 + hub_key: dist_km is already quantized
    to 2 decimals, so the packing is an exact lexicographic encoding
    of (dist_km asc, hub_key asc) — same tie-break as the oracle's
    ORDER BY — and, unlike min(struct(...)) (whose immutable buffer
    forces a SortAggregate that SORTS the expanded relation inside
    each task — the r10 1000x-replica spill lesson, see
    llm/similarity.hash_argmin), min(LONG) stays a hash aggregate.
    No grid needed: NN against a small site list is the broadcast
    case; NN against a large site list routes through
    geo_radius_join's grid with escalating radius.
    """
    pts = _customer_points(spark, sf_dir)
    hubs = _hub_points(spark, sf_dir)
    dist = F.round(F.expr(_PAIR_DIST), 2)
    scored = pts.crossJoin(F.broadcast(hubs)).select(
        "c_custkey", "hub_key", dist.alias("dist_km")
    )
    packed = (
        F.round(F.col("dist_km") * 100, 0).cast("long") * 10000
        + F.col("hub_key").cast("long")
    )
    best = scored.groupBy("c_custkey").agg(
        F.min(packed).alias("k"),
        F.sum(F.when(F.col("dist_km") <= 1000.0, 1).otherwise(0))
        .cast("long")
        .alias("n_within_1000"),
    )
    return best.select(
        "c_custkey",
        (F.col("k") % 10000).cast(dict(scored.dtypes)["hub_key"]).alias(
            "nearest_hub"
        ),
        (F.floor(F.col("k") / 10000) / 100.0).alias("nearest_km"),
        "n_within_1000",
    )


#: label-propagation rounds for hotspot clustering (fixed, unrolled on
#: both engines — labels converge within graph distance CLUSTER_ROUNDS;
#: the dedup_connected_components fixed-round discipline).
CLUSTER_ROUNDS = 3

#: hotspot rule: a cell is HOT when its 3x3 neighborhood holds at least
#: DENSITY_FACTOR x the average neighborhood mass (2x average, computed
#: from the corpus count, so the threshold is scale-relative and both
#: engines derive it identically from exact integers).
DENSITY_FACTOR = 2.0

_GRID_W = 72  # cells per latitude row (360 deg / 5 deg)

_OFFSETS_SQL = """
  CROSS JOIN (VALUES (-1), (0), (1)) d1(dlat)
  CROSS JOIN (VALUES (-1), (0), (1)) d2(dlon)
"""


# Clustered synthesis for the hotspot query: the uniform modular
# lattice used by the other geo queries has deliberately FLAT density
# (nothing exceeds 2x average — verified), so hotspot detection needs
# points scattered around centers. Each customer lands within +/-3.5
# degrees of its (c_custkey % 25)-th hub: 25 deterministic blobs.
_CL_LAT_MILLI = (
    "(((c_custkey % 25) * 37 % 100 - 50) * 1000"
    " + (c_custkey * 7919) % 7000 - 3500)"
)
_CL_LON_MILLI = (
    "(((c_custkey % 25) * 73 % 340 - 170) * 1000"
    " + (c_custkey * 104729) % 7000 - 3500)"
)

_CLUST_PTS_SQL = f"""
  SELECT c_custkey,
         CAST(floor(({_CL_LAT_MILLI} + 60000) / {CELL_MILLI}) AS BIGINT) AS cell_lat,
         CAST(floor(({_CL_LON_MILLI} + 180000) / {CELL_MILLI}) AS BIGINT) AS cell_lon
  FROM customer
"""


def _hotspot_oracle() -> str:
    head = f"""
WITH pts AS ({_CLUST_PTS_SQL}),
cells AS (
  SELECT cell_lat, cell_lon, count(*)::BIGINT AS n FROM pts GROUP BY 1, 2
),
tot AS (SELECT sum(n)::BIGINT AS total FROM cells),
nb AS (
  SELECT a.cell_lat, a.cell_lon,
         sum(b.n)::BIGINT AS nb_count
  FROM cells a {_OFFSETS_SQL}
  JOIN cells b ON b.cell_lat = a.cell_lat + d1.dlat
              AND b.cell_lon = a.cell_lon + d2.dlon
  GROUP BY 1, 2
),
l0 AS (
  SELECT nb.cell_lat, nb.cell_lon, nb.nb_count,
         (nb.cell_lat * {_GRID_W} + nb.cell_lon)::BIGINT AS label
  FROM nb CROSS JOIN tot t
  WHERE nb.nb_count >= ceil({DENSITY_FACTOR} * 9 * t.total / (24.0 * {_GRID_W}))
)"""
    steps = []
    for k in range(1, CLUSTER_ROUNDS + 1):
        steps.append(
            f""",
l{k} AS (
  SELECT h.cell_lat, h.cell_lon, h.nb_count, min(g.label) AS label
  FROM l{k - 1} h {_OFFSETS_SQL}
  JOIN l{k - 1} g ON g.cell_lat = h.cell_lat + d1.dlat
                 AND g.cell_lon = h.cell_lon + d2.dlon
  GROUP BY 1, 2, 3
)"""
        )
    return (
        head
        + "".join(steps)
        + f"""
SELECT cell_lat, cell_lon, nb_count, label AS cluster_id,
       count(*) OVER (PARTITION BY label)::BIGINT AS cluster_size
FROM l{CLUSTER_ROUNDS}
"""
    )


@query("geo_hotspot_clusters", oracle=_hotspot_oracle())
def geo_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based density hotspot clustering (the relational core of
    DBSCAN): cells whose 3x3 neighborhood holds >= 2x the average
    neighborhood mass are HOT, and adjacent hot cells merge into
    clusters by CLUSTER_ROUNDS rounds of min-label propagation over
    the cell adjacency — entirely joins/aggregates, no UDF, no
    iteration over points.

    Why this scales: points are touched exactly once (the cell count
    agg); density, thresholding, and clustering all run on the CELL
    relation, which is bounded by the grid (24 x 72) no matter the
    corpus — the same bounded-state trick as the time-series rollups.
    The threshold is scale-relative (derived from the exact total
    count), so the operator is meaningful at every SF without
    retuning. Fixed-round label semantics: labels are minima within
    graph distance CLUSTER_ROUNDS, identical on both engines by
    unrolled construction (clusters wider than that in cell-graph
    radius would need more rounds — the dedup_connected_components
    convergence caveat, irrelevant on a bounded grid where rounds can
    simply be sized to the grid diameter).
    """
    cust = load_table(spark, sf_dir, "customer")
    lat_m = F.expr(_CL_LAT_MILLI)
    lon_m = F.expr(_CL_LON_MILLI)
    pts = cust.select(
        "c_custkey",
        F.floor((lat_m + 60000) / CELL_MILLI).alias("cell_lat"),
        F.floor((lon_m + 180000) / CELL_MILLI).alias("cell_lon"),
    )
    cells = pts.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from ..cache import track

    cells = track(cells)
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    off2 = (
        spark.range(1)
        .select(F.explode(offs).alias("dlat"))
        .select("dlat", F.explode(offs).alias("dlon"))
    )
    a = cells.crossJoin(F.broadcast(off2))
    b = cells.select(
        F.col("cell_lat").alias("b_lat"),
        F.col("cell_lon").alias("b_lon"),
        F.col("n").alias("b_n"),
    )
    nb = (
        a.join(
            b,
            (F.col("b_lat") == F.col("cell_lat") + F.col("dlat"))
            & (F.col("b_lon") == F.col("cell_lon") + F.col("dlon")),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(F.sum("b_n").cast("long").alias("nb_count"))
    )
    hot = (
        nb.crossJoin(F.broadcast(tot))
        .where(
            F.col("nb_count")
            >= F.ceil(DENSITY_FACTOR * 9 * F.col("total") / (24.0 * _GRID_W))
        )
        .select(
            "cell_lat",
            "cell_lon",
            "nb_count",
            (F.col("cell_lat") * _GRID_W + F.col("cell_lon"))
            .cast("long")
            .alias("label"),
        )
    )
    lbl = hot
    for _ in range(CLUSTER_ROUNDS):
        lbl = track(lbl)
        g = lbl.select(
            F.col("cell_lat").alias("g_lat"),
            F.col("cell_lon").alias("g_lon"),
            F.col("label").alias("g_label"),
        )
        lbl = (
            lbl.crossJoin(F.broadcast(off2))
            .join(
                g,
                (F.col("g_lat") == F.col("cell_lat") + F.col("dlat"))
                & (F.col("g_lon") == F.col("cell_lon") + F.col("dlon")),
            )
            .groupBy("cell_lat", "cell_lon", "nb_count")
            .agg(F.min("g_label").alias("label"))
        )
    from pyspark.sql import Window as W

    return lbl.select(
        "cell_lat",
        "cell_lon",
        "nb_count",
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1))
        .over(W.partitionBy("label"))
        .cast("long")
        .alias("cluster_size"),
    )
