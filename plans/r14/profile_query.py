"""Per-query profiler for optimization round 14 (guide §1).

Usage: python3 plans/r14/profile_query.py <query> [<query> ...]

For each named query: warm it twice (sf0.001 + sf0.01), then run it
once at $SPARK_GRAFT_SF_DIR (default sf0.1) with the noop sink and a
job-group label, and dump per-job wall times + per-stage metrics
(shuffle bytes, task counts) from the UI REST API so the cost can be
attributed to jobs/stages instead of guessed. Also writes the
.explain("formatted") plan to plans/r14/<query>_profile.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_UI_ON", "1")
    # Enable the UI for this profiling session only.
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-profiler")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4046")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    from kickstarter_etl_pipeline_spark.session import RUNTIME_CONFS

    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registry = Q.queries()

    api = "http://localhost:4046/api/v1"
    app_id = spark.sparkContext.applicationId

    def jobs_after(t0_ms: float):
        with urllib.request.urlopen(f"{api}/applications/{app_id}/jobs") as r:
            alljobs = json.load(r)
        out = []
        for j in alljobs:
            st = j.get("submissionTime", "")
            out.append(j)
        return alljobs

    for name in names:
        fn = registry[name]
        for wd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            force(fn(spark, wd))
        # One throwaway timed-scale run so JIT is warm on the real shapes.
        force(fn(spark, sf_dir))
        before = {j["jobId"] for j in jobs_after(0)}
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        after = jobs_after(0)
        mine = [j for j in after if j["jobId"] not in before]
        mine.sort(key=lambda j: j["jobId"])
        print(f"\n===== {name}: wall {wall:.3f}s, {len(mine)} jobs =====")
        stage_rows = []
        with urllib.request.urlopen(
            f"{api}/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = {s["stageId"]: s for s in json.load(r)}
        for j in mine:
            sids = sorted(j.get("stageIds", []))
            dur = ""
            tot_ms = 0
            parts = []
            for sid in sids:
                s = stages.get(sid)
                if not s:
                    continue
                ms = s.get("executorRunTime", 0)
                sh_r = s.get("shuffleReadBytes", 0)
                sh_w = s.get("shuffleWriteBytes", 0)
                nt = s.get("numCompleteTasks", 0)
                nm = s.get("name", "")[:60]
                parts.append(
                    f"    stage {sid}: run {ms} ms, {nt} tasks, shR {sh_r}, shW {sh_w}  {nm}"
                )
            from datetime import datetime

            def _p(ts: str) -> float:
                try:
                    return datetime.strptime(
                        ts.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                    ).timestamp()
                except Exception:
                    return 0.0

            jw = _p(j.get("completionTime", "")) - _p(j.get("submissionTime", ""))
            print(
                f"  job {j['jobId']}: wall {jw:.3f}s  {j.get('name','')[:80]}  stages={sids}"
            )
            for p in parts:
                print(p)
        sys.stdout.flush()

    spark.stop()


if __name__ == "__main__":
    main()
