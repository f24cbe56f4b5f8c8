"""Build a duplicate-density-CONTROLLED documents replica for dedup
scaling runs.

`build_scale_replica.py` clones documents VERBATIM, so every original
contributes C(K,2) true-duplicate pairs — duplicate mass grows
quadratically in K and any pair-scoring dedup measured on it reports
the workload's growth, not the plan's (the r9 `dedup_minhash_bbit`
adjudication). This variant keeps duplicate DENSITY constant instead:
every word of clone i's text is prefixed with "i_", so cross-clone
shingle Jaccard is ~0 (no token survives verbatim) while WITHIN-clone
near-duplicate structure — the thing dedup operators are supposed to
find — is preserved exactly (a deterministic token bijection cannot
change any within-clone Jaccard). Candidate volume then scales
linearly with K, which is what a real corpus at K-fold size does.

Writes documents.parquet only (dedup queries read nothing else);
point $SPARK_GRAFT_SF_DIR / time_queries.py at the output dir.

Usage: python tools/build_dedup_replica.py [K] [src_sf_dir] [out_dir]
Defaults: K=1000, /root/testdata/sf0.1, /tmp/spark_graft_dedup_replica
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 100_000_000


def build(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    src_file = os.path.join(src, "documents.parquet")
    out_file = os.path.join(out, "documents.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
COPY (
  SELECT doc_id + r.i * {OFF} AS doc_id,
         r.i::VARCHAR || '_' ||
           replace(text, ' ', ' ' || r.i::VARCHAR || '_') AS text,
         lang, source,
         length(r.i::VARCHAR || '_' ||
           replace(text, ' ', ' ' || r.i::VARCHAR || '_'))::BIGINT AS n_chars
  FROM '{src_file}' CROSS JOIN (SELECT unnest(range({k})) AS i) r
) TO '{out_file}' (FORMAT PARQUET)
"""
    )
    n = con.sql(f"SELECT count(*) FROM '{out_file}'").fetchone()[0]
    print(f"documents: {n} rows (x{k}, density-controlled)")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_dedup_replica"
    build(k, src, out)
