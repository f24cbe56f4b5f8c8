"""Build a K-fold lineitem/orders replica carrying ONLY the columns
the neighborhood-function family reads — the 1000x fixture that fits
a single box's disk.

`build_scale_replica.py` replicates every table full-width; at K=1000
that is ~50 GB before the first query runs. The HyperBall family
(`graph_neighborhood_registers` / `graph_effective_diameter` /
`graph_neighborhood_function`) touches exactly four columns —
lineitem(l_orderkey, l_suppkey) and orders(o_orderkey, o_custkey) —
and Catalyst's column pruning means the scan reads exactly those
columns from a full-width fixture anyway (`ReadSchema` in the plan),
so a column-pruned replica is byte-identical INPUT to the operator
while costing ~10 GB instead of ~35. Keys get the standard disjoint
per-replica offsets (replica i's lineitem references replica i's
orders), so the K-fold graph is K disjoint copies of the source graph
— every per-round register/delta/shipped count scales EXACTLY by K
(the property the delta-propagation accounting tables lean on).

Usage: python tools/build_nf_replica.py [K] [src_sf_dir] [out_dir]
Defaults: K=1000, /root/testdata/sf0.1, /tmp/spark_graft_nf_replica
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 100_000_000


def build(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, sel in (
        (
            "lineitem",
            "l_orderkey + r.i * {o} AS l_orderkey, "
            "l_suppkey + r.i * {o} AS l_suppkey",
        ),
        (
            "orders",
            "o_orderkey + r.i * {o} AS o_orderkey, "
            "o_custkey + r.i * {o} AS o_custkey",
        ),
    ):
        src_file = os.path.join(src, f"{table}.parquet")
        out_file = os.path.join(out, f"{table}.parquet")
        con.sql(
            f"""
COPY (
  SELECT {sel.format(o=OFF)}
  FROM '{src_file}' CROSS JOIN (SELECT unnest(range({k})) AS i) r
) TO '{out_file}' (FORMAT PARQUET)
"""
        )
        n = con.sql(f"SELECT count(*) FROM '{out_file}'").fetchone()[0]
        mb = os.path.getsize(out_file) / 1e6
        print(f"{table}: {n} rows, {mb:.0f} MB (x{k}, column-pruned)")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_nf_replica"
    build(k, src, out)
