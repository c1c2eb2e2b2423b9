"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Per normal bench practice, JVM/session startup is excluded (the session
is built and warmed before timing). Each query is forced end-to-end with
the noop sink so every output column is actually computed (a bare
count() would let Catalyst prune the expensive expressions away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kickstarter_etl_pipeline_spark.session import get_spark
from kickstarter_etl_pipeline_spark import queries as Q

#: Headline set: the reference-parity pipeline (star build + rollup),
#: the classic analytics shapes, and one of each extension family at
#: its scale-path variant (LSH, not the quadratic exact ops).
BENCH_QUERIES = [
    "star_flagship",
    "fact_star",
    "q1_pricing_summary",
    "topk_customers",
    "window_running_sum",
    "region_rollup",
    "events_tumbling",
    "events_sessionize",
    "dedup_exact",
    "text_stats",
    "minhash_dedup_pairs",
    "embedding_topk",
    # round 2: skew-mitigated join, 6-way join shape, multi-table ANN
    "skew_salted_join",
    "q7_nation_volume",
    "ann_lsh_topk",
]


def force(df) -> None:
    """Execute the full plan, computing every output column, no disk IO."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    spark = get_spark("kickstarter-etl-bench")
    registry = Q.queries()

    # Warm the JVM + parquet footers outside the timed region.
    registry["group_count_ordered"](spark, sf_dir).collect()

    from kickstarter_etl_pipeline_spark.operators.partitioning import free_local_checkpoints

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        start = time.perf_counter()
        force(registry[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)
        # Each query is fully materialized by force(); reclaim its
        # checkpoint blocks deterministically so a long bench session
        # holds at most one query's worth of storage.
        free_local_checkpoints(spark)

    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
