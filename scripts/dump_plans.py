#!/usr/bin/env python
"""Dump .explain("formatted") for gated queries to plans/r08/<q>_<tag>.txt.

Usage: PYTHONPATH=/root/repo python scripts/dump_plans.py <tag> q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r08")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from streaming_algorithms_spark.sources.session import get_spark

    spark = get_spark("dump_plans", cores=32, shuffle_partitions=32)
    from streaming_algorithms_spark.plans.queries import QUERIES

    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
