"""Dump `.explain("formatted")` for queries to plans/<dir>/<query>_<tag>.txt.

Usage: python tools/dump_plan.py R15DIR TAG QUERY [QUERY ...]
       e.g. python tools/dump_plan.py plans/r15 before graph_hits

Runs at sf0.01 (plan shape, not data volume). The optimize-round
evidence files VERDICT checks live here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

from aws_etl_pipeline_spark.cache import clear_persisted  # noqa: E402
from aws_etl_pipeline_spark.plans.explain import plan_string  # noqa: E402
from aws_etl_pipeline_spark.registry import all_queries  # noqa: E402
from aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    spark = get_spark("dump-plan")
    for name in names:
        df = qs[name].fn(spark, SF)
        txt = plan_string(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = sum(
            1
            for line in txt.splitlines()
            if "Exchange" in line and "ReusedExchange" not in line
        )
        print(f"{path}: {len(txt.splitlines())} lines, {n_ex} Exchange")
        clear_persisted()


if __name__ == "__main__":
    main()
