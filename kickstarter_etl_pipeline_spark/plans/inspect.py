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


def _parse_tree(text: str) -> list[tuple[int, str, str]]:
    """Parse the formatted explain's tree section into
    (indent, operator name, id) triples, in pre-order."""
    tree: list[tuple[int, str, str]] = []
    for line in text.splitlines():
        m = re.match(r"^([:+\-| ]*)(?:\* )?([A-Za-z][\w .]*?) \((\d+)\)\s*$", line)
        if m:
            tree.append((len(m.group(1)), m.group(2), m.group(3)))
    return tree


def _detail_blocks(text: str) -> dict[str, str]:
    """Map operator id → its detail block ("(4) Exchange\\nArguments: …")."""
    blocks: dict[str, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) [A-Za-z][^\n]*\n((?:(?!\(\d+\) )[^\n]*\n?)*)",
        text,
        flags=re.MULTILINE,
    ):
        blocks[m.group(1)] = m.group(2)
    return blocks


def _children(tree: list[tuple[int, str, str]], idx: int) -> list[int]:
    """Direct children of tree[idx]: the minimal-indent nodes in its
    following deeper-indented span."""
    ind = tree[idx][0]
    span: list[int] = []
    for j in range(idx + 1, len(tree)):
        if tree[j][0] <= ind:
            break
        span.append(j)
    if not span:
        return []
    child_ind = min(tree[j][0] for j in span)
    return [j for j in span if tree[j][0] == child_ind]


#: Single-child operators that preserve (or reduce) a one-row bound.
_ROW_PRESERVING = (
    "Project",
    "Filter",
    "BroadcastExchange",
    "Exchange",
    "Sort",
    "Window",
    "WindowGroupLimit",
    "ColumnarToRow",
    "InputAdapter",
    "Coalesce",
    "AQEShuffleRead",
    "Subquery",
    "HashAggregate",  # handled specially below (grouped vs global)
)


def _one_row_subtree(
    tree: list[tuple[int, str, str]], details: dict[str, str], idx: int
) -> bool:
    """True iff the subtree at tree[idx] provably produces at most ONE
    row (or a constant-bounded handful): a global aggregate
    ("Keys: []"), a LIMIT, or joins/pass-through operators over such.
    Conservative — anything unrecognized returns False."""
    _, name, oid = tree[idx]
    if "Aggregate" in name:
        det = details.get(oid, "")
        if re.search(r"Keys(?: \[\d+\])?: \[\]", det):
            return True
        kids = _children(tree, idx)  # grouped agg of one row is one row
        return bool(kids) and all(_one_row_subtree(tree, details, k) for k in kids)
    if name.startswith(("GlobalLimit", "CollectLimit", "TakeOrderedAndProject")):
        return True  # bounded by the literal limit
    if "Join" in name or name.startswith("CartesianProduct"):
        kids = _children(tree, idx)
        return len(kids) == 2 and all(
            _one_row_subtree(tree, details, k) for k in kids
        )
    if any(name.startswith(p) for p in _ROW_PRESERVING):
        kids = _children(tree, idx)
        return bool(kids) and all(_one_row_subtree(tree, details, k) for k in kids)
    return False


def _classify_nested_loop_joins(text: str) -> tuple[int, int]:
    """(benign, total) BroadcastNestedLoopJoins in the plan: benign =
    the BROADCAST side is provably ≤ a constant number of rows (the
    scalar-totals / one-row-argmax crossJoin device), where the join is
    O(n·c) — a per-row constant lookup, not a pair blow-up."""
    tree = _parse_tree(text)
    details = _detail_blocks(text)
    benign = total = 0
    for i, (_ind, name, _oid) in enumerate(tree):
        if not name.startswith("BroadcastNestedLoopJoin"):
            continue
        total += 1
        kids = _children(tree, i)
        if len(kids) != 2:
            continue
        build = kids[0] if "BuildLeft" in name else kids[1]
        if _one_row_subtree(tree, details, build):
            benign += 1
    return benign, total


def _single_partition_feeds_only_aggregates(text: str) -> bool:
    """True iff EVERY SinglePartition exchange in a formatted plan is
    consumed by an aggregate operator — the partial→final global-
    aggregate pattern, where the one-task exchange carries only one
    partial row per input partition and is therefore benign.

    Parses the formatted explain's two sections: the detail blocks
    ("(4) Exchange\\nArguments: SinglePartition, ...") name WHICH
    exchanges are single-partition; the tree ("+- Exchange (4)") gives
    each one's parent (the nearest shallower-indented line above).
    Any parse miss or non-aggregate parent returns False — the caller
    then keeps the loud WARN, so the soft path only triggers on plans
    this function fully understood.
    """
    # a detail block is "(4) Exchange" followed by Output/Input/
    # Arguments lines until the next "(n) Op" header — Arguments is
    # NOT necessarily the first line, so scan within the block.
    sp_ids = set(
        re.findall(
            r"\((\d+)\) Exchange\n(?:(?!\(\d+\) )[^\n]*\n)*?Arguments: SinglePartition",
            text,
        )
    )
    if not sp_ids:
        return False
    tree: list[tuple[int, str, str]] = []
    for line in text.splitlines():
        m = re.match(r"^([:+\-| ]*)(?:\* )?([A-Za-z][\w .]*?) \((\d+)\)\s*$", line)
        if m:
            tree.append((len(m.group(1)), m.group(2), m.group(3)))
    seen = set()
    for i, (indent, _name, oid) in enumerate(tree):
        if oid not in sp_ids:
            continue
        seen.add(oid)
        parent = None
        for j in range(i - 1, -1, -1):
            if tree[j][0] < indent:
                parent = tree[j][1]
                break
        if parent is None or "Aggregate" not in parent:
            return False
    return seen == sp_ids


def advise(df: DataFrame) -> list[str]:
    """Scale-hazard advisor: the judgments the repo's plan-shape tests
    make about ITS queries, exposed for a user's OWN queries — run it
    before shipping a pipeline to a large cluster and fix what it
    names. Pure plan-text analysis (no job runs). Each finding is one
    actionable sentence prefixed with a severity tag.

    What it flags (and why it matters at 100 TB):

    - ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — a join with
      no usable equi-key; O(n·m) at scale. Usually a missing join
      condition or a non-equi predicate that needs a banding key.
    - ``Exchange SinglePartition`` — a global sort/limit/window
      funneling EVERYTHING through one task (the classic
      Window-without-partitionBy trap; use two_phase_rank-style range
      exchanges, TakeOrderedAndProject, or partial aggregates). When
      every such exchange feeds a final aggregate (the partial→final
      global-summary pattern), only one partial row per partition
      crosses it — that case is demoted to INFO, not WARN.
    - filters that did not reach a file scan — a scan reading rows a
      Filter above it immediately drops; rewrite the predicate on the
      scanned column (not on a derived expression) so it pushes down.
    - no whole-stage codegen anywhere — the plan runs on the
      interpreted path end to end (Python UDFs or exotic operators);
      move hot expressions to built-in Column functions.
    """
    text = explain_text(df)
    s = plan_summary(df)
    findings: list[str] = []
    if s["has_cartesian"]:
        findings.append(
            "CRITICAL: CartesianProduct in the plan — O(n·m) pair blow-up at "
            "scale; add an equi-join key or a banding/bucketing key."
        )
    if s["n_nested_loop_joins"]:
        benign, total = _classify_nested_loop_joins(text)
        risky = total - benign
        if risky:
            findings.append(
                f"CRITICAL: {risky} BroadcastNestedLoopJoin(s) with an "
                "unbounded broadcast side — non-equi join semantics; every "
                "probe row scans the whole broadcast side. Restructure as an "
                "equi-join on a derived key (range bands, buckets) unless "
                "that side is provably tiny."
            )
        if benign:
            findings.append(
                f"INFO: {benign} BroadcastNestedLoopJoin(s) whose broadcast "
                "side is provably bounded (global aggregate / LIMIT — the "
                "scalar-totals crossJoin device): O(n·c) per-row constant "
                "lookup, not a pair blow-up."
            )
    # formatted mode renders the distribution in the operator's
    # Arguments line ("Arguments: SinglePartition, ..."), not the
    # "(n) Exchange" header.
    if "SinglePartition" in text:
        if _single_partition_feeds_only_aggregates(text):
            findings.append(
                "INFO: Exchange SinglePartition feeding a final aggregate — "
                "only per-partition PARTIAL rows cross the exchange (one row "
                "per input partition, not the data), the normal global-"
                "summary shape; nothing to fix unless the aggregate state "
                "itself is huge (collect_list/collect_set of the data)."
            )
        else:
            findings.append(
                "WARN: Exchange SinglePartition — a global sort/window/limit "
                "is funneling all rows through ONE task; partition the "
                "window, use a range-exchange two-phase rank, or a "
                "TakeOrderedAndProject top-k instead."
            )
    n_filters = len(re.findall(r"^\(\d+\) Filter\b", text, flags=re.MULTILINE))
    if s["n_scans"] and n_filters and not s["pushed_filters"]:
        findings.append(
            "WARN: Filter operators present but NO filter reached a scan "
            "(PushedFilters empty) — if the predicate tests a raw column, "
            "move it above the first projection; derived-expression "
            "predicates never push."
        )
    # An UNEXECUTED AdaptiveSparkPlan renders without "[codegen id : N]"
    # markers (they appear once stages finalize), so absence of codegen
    # under AQE is indeterminate, not a finding — only flag plans that
    # are codegen-free WITHOUT the AQE wrapper (pure mapInPandas /
    # Python-UDF pipelines, exotic operators).
    if not s["whole_stage_codegen"] and "AdaptiveSparkPlan" not in text:
        findings.append(
            "INFO: no whole-stage codegen span in the plan — the query runs "
            "interpreted (Python UDF / exotic operator on the hot path?); "
            "prefer built-in Column expressions or Arrow-batched pandas "
            "UDFs."
        )
    return findings
