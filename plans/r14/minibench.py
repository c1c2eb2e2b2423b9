"""Subset bench mirroring bench.py methodology (2-stage warm, min-of-N,
noop sink). Usage: python3 plans/r14/minibench.py q1 q2 ..."""

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
    spark = get_spark("r14-minibench")
    registry = Q.queries()
    for wd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            force(registry[name](spark, wd))
    timings = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(registry[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        timings[name] = {"min": min(samples), "runs": samples}
    print(json.dumps(timings, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
