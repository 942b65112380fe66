"""Physical-plan scale audit as a library API.

The repo's own quality gate (``tools_plan_audit.py`` → PLANS.md) checks
every benchmark plan for the hazards that kill jobs at 100 TB; this
module exposes the same checks to USERS, so a pipeline can assert its
plan shape in CI the way this repo does:

    report = audit_plan(df)
    assert report["cartesian"] == 0 and report["pushed_filters"] > 0

Plan shape is scale-independent — auditing against sample data proves
the same properties the full-size run will have.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_plan(df: DataFrame) -> dict:
    """Audit a DataFrame's physical plan for scale hazards.

    Returns counters over the optimized physical plan:

    - ``exchanges``: shuffle boundaries (each is a full data movement);
    - ``broadcast_hash_joins`` / ``sort_merge_joins``: the healthy join
      strategies;
    - ``cartesian``: CartesianProduct + BroadcastNestedLoopJoin — the
      quadratic joins that must be zero unless a build side is
      constant-size by construction;
    - ``pushed_filters``: parquet scans that received pushed predicates
      (a selective query with 0 is rescanning everything);
    - ``takeordered``: top-k compiled to TakeOrderedAndProject instead
      of a full global sort;
    - ``whole_stage_codegen``: codegen spans (Python UDFs and
      interpreted expressions break them);
    - ``has_partitionless_window``: a window with an ORDER BY but no
      PARTITION BY — executes as ONE task holding everything (use the
      two-phase range-scan primitives instead).
    """
    formatted = _explain(df, "formatted")
    simple = _explain(df, "simple")
    pushed = [
        x
        for x in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
        if x.strip()
    ]
    # a windowspecdefinition whose FIRST argument is already the sort
    # spec (… ASC/DESC …) or the frame itself has NO partition columns —
    # Spark executes it as a single task holding the whole input
    partitionless = (
        re.search(
            r"windowspecdefinition\((?:[^,()]*\s(?:ASC|DESC)"
            r"|specifiedwindowframe)",
            formatted,
        )
        is not None
    )
    return {
        "exchanges": simple.count("Exchange"),
        "broadcast_hash_joins": simple.count("BroadcastHashJoin"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "cartesian": simple.count("CartesianProduct")
        + simple.count("BroadcastNestedLoopJoin"),
        "pushed_filters": len(pushed),
        "takeordered": "TakeOrderedAndProject" in simple,
        "whole_stage_codegen": simple.count("*("),
        "has_partitionless_window": partitionless,
    }


def assert_scale_safe(
    df: DataFrame,
    allow_cartesian: bool = False,
    require_pushed_filters: bool = False,
) -> dict:
    """Raise ``AssertionError`` when the plan contains a scale hazard;
    returns the audit dict on success. The CI-gate form of
    :func:`audit_plan`."""
    report = audit_plan(df)
    if not allow_cartesian and report["cartesian"] > 0:
        raise AssertionError(
            f"plan contains {report['cartesian']} cartesian/BNL join(s)"
        )
    if report["has_partitionless_window"]:
        raise AssertionError(
            "plan contains a partitionless global window (single-task); "
            "use global_row_number / global_prefix_sum instead"
        )
    if require_pushed_filters and report["pushed_filters"] == 0:
        raise AssertionError("no filters were pushed to any scan")
    return report
