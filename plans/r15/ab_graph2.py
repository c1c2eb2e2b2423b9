"""Interleaved A/B: loop_frame repartition-pin vs narrow-coalesce-pin
across the graph-loop bench queries, by monkeypatching the name
``loop_frame`` inside operators.graph for the "new" runs.

The coalesce keeps the checkpoint's stored width at n (the knob's
documented purpose — hash partitioning never survives the checkpoint
anyway) without paying a full exchange per round. Falls back to
repartition when the frame is narrower than n (coalesce can only
shrink).

Usage: python3 plans/r15/ab_graph2.py [reps] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402
from kickstarter_etl_pipeline_spark.operators import graph as G  # noqa: E402

_orig_loop_frame = G.loop_frame


def _coalesce_loop_frame(df, n, *keys):
    if n:
        df = df.coalesce(int(n))
    return df.localCheckpoint(eager=True)


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or [
        "graph_pagerank", "graph_bfs_depths", "graph_hits",
        "graph_spectral_partition", "graph_ktruss", "part_hierarchy_rollup",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-graph2")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    def build(name, mode, sf):
        G.loop_frame = _orig_loop_frame if mode == "old" else _coalesce_loop_frame
        try:
            return registry[name](spark, sf)
        finally:
            G.loop_frame = _orig_loop_frame

    def run(name, mode, sf):
        df = build(name, mode, sf)
        force(df)

    # equality check at sf0.01
    for name in names:
        o = sorted(map(tuple, build(name, "old", "/root/testdata/sf0.01").collect()))
        n = sorted(map(tuple, build(name, "new", "/root/testdata/sf0.01").collect()))
        print(f"{name}: equal={o == n} rows={len(o)}", flush=True)
    for name in names:
        olds, news = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); run(name, "old", sf_dir); olds.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter(); run(name, "new", sf_dir); news.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: old {olds} min {min(olds):.3f} | new {news} min {min(news):.3f}", flush=True)
    print("loadavg", os.getloadavg())


if __name__ == "__main__":
    main()
