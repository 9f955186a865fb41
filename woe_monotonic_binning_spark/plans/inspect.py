"""Physical-plan inspection: the scale audit toolkit.

The reference is eager pandas with no plan at all; on Spark the physical plan
IS the performance contract at 100 TB.  These helpers parse
``df.explain("formatted")`` output so tests (tests/test_plans.py) can pin the
properties that matter at scale and fail when a refactor regresses them:

- **exchange_count** — every Exchange is a cluster-wide shuffle of the
  operator's input; the fit path must have exactly one over raw data.
- **pushed_filters / scan_read_columns** — predicate pushdown and column
  pruning must reach the parquet scan; a scan reading all 16 lineitem
  columns for a 2-column query is a 8x IO regression at 100 TB.
- **python_eval_count** — row-at-a-time Python in the hot path is the
  10-100x slow path; only the grouped-map fit UDF (ArrowEvalPython over the
  tiny summary) is allowed.
- **broadcast/sort_merge_join_count** — a dimension join that degrades from
  broadcast to sort-merge adds a full shuffle of the fact table.
- **codegen_span_count** — whole-stage codegen fusion; fewer, wider spans
  mean the JVM runs fused loops rather than row iterators.
"""

from __future__ import annotations

import re
from contextlib import redirect_stdout
from io import StringIO

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` as a string."""
    buf = StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _node_count(plan: str, name_regex: str) -> int:
    """Count physical operators by their detail-section header ``(n) Name`` —
    the tree section repeats every node, so raw substring counts double."""
    return len(re.findall(rf"\(\d+\)\s+(?:{name_regex})\b", plan))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (broadcast exchanges excluded)."""
    return _node_count(formatted_plan(df), "Exchange|ShuffleExchange")


def broadcast_join_count(df: DataFrame) -> int:
    return _node_count(formatted_plan(df), "BroadcastHashJoin|BroadcastNestedLoopJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _node_count(formatted_plan(df), "SortMergeJoin")


def python_eval_count(df: DataFrame, kind: str | None = None) -> int:
    """Python evaluation operators in the plan.

    ``kind='row'`` counts only row-at-a-time ``BatchEvalPython`` (the slow
    path); ``kind='arrow'`` only Arrow-vectorized ones (pandas UDFs /
    grouped map); default counts both.
    """
    plan = formatted_plan(df)
    row = _node_count(plan, "BatchEvalPython")
    arrow = _node_count(plan, "ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|MapInArrow")
    if kind == "row":
        return row
    if kind == "arrow":
        return arrow
    return row + arrow


def forced_broadcast_hint_count(df: DataFrame) -> int:
    """User-forced ``F.broadcast(...)`` hints in the ANALYZED logical plan.

    A BroadcastHashJoin the optimizer/AQE picks for a genuinely small side
    is good; a user-forced hint on an UNBOUNDED input is a scale bug — it
    overrides Spark's size checks, so at 100 TB it OOMs the driver and
    every executor instead of degrading to a shuffle join.  Hints exist
    only in the logical plan (the physical plan shows the same
    BroadcastHashJoin either way), so this inspects the analyzed plan.
    """
    logical = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast", logical))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Column names of each scan's ReadSchema — the pruning audit."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", plan):
        body = m.group(1)
        cols = [f.split(":")[0].strip() for f in body.split(",") if f.strip()]
        schemas.append(cols)
    return schemas


def codegen_span_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans (codegen id count)."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids)


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by hand while tuning."""
    return {
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sort_merge_joins": sort_merge_join_count(df),
        "python_row_evals": python_eval_count(df, "row"),
        "python_arrow_evals": python_eval_count(df, "arrow"),
        "codegen_spans": codegen_span_count(df),
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_read_columns(df),
    }
