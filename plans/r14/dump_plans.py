"""Dump .explain('formatted') for bench queries to plans/r14/<q>_<tag>.txt.

Usage: python3 plans/r14/dump_plans.py <tag> [query ...]
With no query names, dumps every BENCH_QUERIES entry.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-plandump")
    registry = Q.queries()
    outdir = os.path.join(_REPO, "plans", "r14")
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print("dumped", name)
    spark.stop()


if __name__ == "__main__":
    main()
