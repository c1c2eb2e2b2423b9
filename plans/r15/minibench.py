"""Mini-bench: bench.py methodology (two warm passes + min-of-N at
sf0.1 with the noop sink) over just the named queries.

Usage: python3 plans/r15/minibench.py q1 q2 ...
Env: SPARK_GRAFT_BENCH_RUNS (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = get_spark("r15-minibench")
    registry = Q.queries()
    for wd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            force(registry[name](spark, wd))
    out = {}
    detail = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(registry[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        detail[name] = samples
        out[name] = min(samples)
    print(json.dumps({"queries": out, "runs": detail, "loadavg": os.getloadavg()}))


if __name__ == "__main__":
    main()
