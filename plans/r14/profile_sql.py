"""Profile one query via the SQL REST endpoint: per-node metrics of the
final AQE plan. Usage: python3 plans/r14/profile_sql.py <query>"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession  # noqa: E402

from kickstarter_etl_pipeline_spark.session import RUNTIME_CONFS  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-sqlprof")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .config("spark.driver.memory", "8g")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registry = Q.queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(registry[name](spark, "/root/testdata/sf0.01"))
    t0 = time.perf_counter()
    force(registry[name](spark, sf_dir))
    print(f"wall {time.perf_counter()-t0:.3f}s")
    api = "http://localhost:4047/api/v1"
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{api}/applications/{app_id}/sql?details=true&planDescription=true&length=200"
    ) as r:
        execs = json.load(r)
    # take all executions, print nodes with duration-ish metrics
    for e in execs[-6:]:
        print(f"\n=== SQL exec {e['id']} status={e['status']} duration={e.get('duration')}ms")
        for node in e.get("nodes", []):
            mets = {
                m["name"]: m["value"]
                for m in node.get("metrics", [])
                if any(
                    key in m["name"]
                    for key in ("time total", "number of output rows", "duration", "shuffle bytes written", "records read")
                )
            }
            if mets:
                print(f"  [{node['nodeId']}] {node['nodeName']}: {mets}")
    spark.stop()


if __name__ == "__main__":
    main()
