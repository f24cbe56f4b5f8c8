"""Build a K-fold scale replica of a testdata SF for scaling-slope runs.

The driver testdata tops out at sf0.1; to measure how the headline set
scales (and expose anything super-linear — hidden driver-side work,
expand blowups, broadcast-threshold cliffs) we synthesize an
sf{0.1*K} replica the same way TPC-H scales: the tiny dims
(region/nation) stay fixed, every fact/large table is replicated K
times with per-replica key offsets that preserve referential
integrity (replica i's orders reference replica i's customers, etc.).
Non-key attributes are copied verbatim, so per-key cardinalities and
value distributions match the source SF; only the number of entities
grows. The replica is a BENCH input only — correctness runs stay on
the driver's own parquet.

Usage: python tools/build_scale_replica.py [K] [src_sf_dir] [out_dir]
Defaults: K=10, /root/testdata/sf0.1, /tmp/spark_graft_sf1_replica
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

#: per-replica key offset — far above any key at source SF, keeps
#: replica key ranges disjoint.
OFF = 100_000_000

#: table -> columns that get the per-replica offset (foreign keys use
#: the SAME offset as the table they reference, preserving joins).
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation"]


def build(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        src_file = os.path.join(src, f"{t}.parquet")
        cols = [
            c[0]
            for c in con.sql(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()
        ]
        sel = ", ".join(
            f"({c} + r.i * {OFF}) AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src_file}' CROSS JOIN "
            f"(SELECT unnest(range({k})) AS i) r) "
            f"TO '{os.path.join(out, t + '.parquet')}' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{os.path.join(out, t + '.parquet')}'"
        ).fetchone()[0]
        print(f"{t}: {n} rows (x{k})")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/tmp/spark_graft_sf1_replica"
    )
    build(k, src, out)
