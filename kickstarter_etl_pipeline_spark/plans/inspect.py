"""Plan inspection — V1/V2 validation extended to the physical plan.

The reference logs schema and sample rows (``src/etl_pipeline.py:74-75``)
as its observability surface. At cluster scale the thing worth watching
is the PLAN: did the filter reach the scan, did the dim broadcast, how
many shuffles will this query pay. ``plan_summary`` condenses
``explain('formatted')`` into a dict so pipelines can assert on plan
shape programmatically (the same checks tests/test_plan_shapes.py makes,
exposed as a runtime API).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Condense the physical plan into the scale-relevant facts."""
    text = explain_text(df)
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        if m.group(1).strip():
            pushed.extend(p.strip() for p in m.group(1).split(","))
    read_schemas = re.findall(r"ReadSchema: struct<(.*?)>", text)
    # Formatted explain prints each operator twice (tree + numbered
    # details) — count only the "(n) Operator" detail headers.
    def n_ops(pattern: str) -> int:
        return len(re.findall(rf"^\(\d+\) {pattern}", text, flags=re.MULTILINE))

    return {
        "n_scans": n_ops(r"Scan (parquet|csv|orc|json)"),
        "n_exchanges": n_ops(r"Exchange\b"),
        "n_broadcast_joins": n_ops(r"BroadcastHashJoin"),
        "n_sortmerge_joins": n_ops(r"SortMergeJoin"),
        "n_nested_loop_joins": n_ops(r"BroadcastNestedLoopJoin"),
        "has_cartesian": "CartesianProduct" in text,
        "pushed_filters": pushed,
        "read_columns": sorted(
            {c.split(":")[0] for schema in read_schemas for c in schema.split(",") if ":" in c}
        ),
        # formatted mode marks codegen'd operators with "[codegen id : N]"
        "whole_stage_codegen": "codegen id" in text or "WholeStageCodegen" in text,
    }
