"""Dump .explain('formatted') for bench queries to plans/r15/<q>_<tag>.txt.

Usage: python3 plans/r15/dump_plans.py <tag> [query ...]
With no query names, dumps every BENCH_QUERIES entry.

r15 (VERDICT r14 item 6): the r14 dumps were checkpoint-truncated —
queries that localCheckpoint mid-plan dumped a final plan that starts
at `Scan ExistingRDD`, hiding the expression-level evidence (e.g. the
let1 single-binding of split()). This version monkeypatches
DataFrame.localCheckpoint for the duration of each query BUILD so the
subplan that FEEDS every checkpoint is captured too: each dump file
contains `== checkpoint N (feeding subplan) ==` sections in build
order, then `== final plan ==`. The patch wraps only the dump script's
session — product code is untouched.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

# Spark 4: the runtime class is pyspark.sql.classic.dataframe.DataFrame
# (pyspark.sql.DataFrame is the abstract base whose method the classic
# subclass overrides — patching the base would capture nothing)
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark import queries as Q  # noqa: E402


def _explain(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-plandump")
    registry = Q.queries()
    outdir = os.path.dirname(os.path.abspath(__file__))

    orig_ckpt = DataFrame.localCheckpoint
    sections: list[str] = []

    def traced_ckpt(self: DataFrame, eager: bool = True):  # noqa: ANN001
        try:
            sections.append(_explain(self))
        except Exception as e:  # noqa: BLE001
            sections.append(f"(explain failed: {e})")
        return orig_ckpt(self, eager)

    for name in names:
        sections.clear()
        DataFrame.localCheckpoint = traced_ckpt
        try:
            df = registry[name](spark, sf_dir)
            final = _explain(df)
        except Exception as e:  # noqa: BLE001
            final = f"ERROR building {name}: {e}"
        finally:
            DataFrame.localCheckpoint = orig_ckpt
        parts = []
        for i, s in enumerate(sections, 1):
            parts.append(f"== checkpoint {i} (feeding subplan) ==\n{s}\n")
        parts.append(f"== final plan ==\n{final}\n")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write("\n".join(parts))
        print("dumped", name, f"({len(sections)} checkpoints)")
    spark.stop()


if __name__ == "__main__":
    main()
