"""Split a query's wall clock into driver-side vs execution segments:
fn() build time (lazy plan construction + any eager fixture staging),
queryExecution optimization time (explain cost), and count() execution.

The bench's per-rep region is fn()+count(); at bench SF the data is
tiny, so a query whose count() segment is dominated by the optimize
segment is paying Catalyst, not the cluster — a different fix
(shrink the expression tree / plan) than a shuffle-bound query.

Usage: python tools/profile_split.py QUERY [QUERY ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

from aws_etl_pipeline_spark.cache import clear_persisted  # noqa: E402
from aws_etl_pipeline_spark.registry import all_queries  # noqa: E402
from aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    qs = all_queries()
    spark = get_spark("profile-split")
    sc = spark.sparkContext
    for name in names:
        q = qs[name]
        # warm-up: codegen + fixture staging
        q.fn(spark, SF_DIR).count()
        clear_persisted()
        rows = []
        for _ in range(REPS):
            t0 = time.time()
            df = q.fn(spark, SF_DIR)
            t1 = time.time()
            # force analysis+optimization without execution
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            before_jobs = sc._jsc.sc().dagScheduler().nextJobId()
            df.count()
            t3 = time.time()
            after_jobs = sc._jsc.sc().dagScheduler().nextJobId()
            clear_persisted()
            rows.append((t1 - t0, t2 - t1, t3 - t2, after_jobs - before_jobs))
        best = min(rows, key=lambda r: r[0] + r[1] + r[2])
        print(
            f"{name}: build={best[0]:.3f}s optimize={best[1]:.3f}s "
            f"execute={best[2]:.3f}s jobs={best[3]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
