"""Physical-plan inspection: the 'is this plan the one I meant to
ship' API.

Every scale property this engine pins in its test suite — filters
reaching the scan, small sides broadcasting, top-k staying a heap, no
Python in the scan path — is a string property of the executed plan.
``plan_stats`` extracts them as numbers so pipelines can ASSERT their
plan shape in CI instead of discovering a rogue SortMergeJoin in a
100 TB bill: a query that silently regresses from broadcast to
sort-merge changes a counter here long before it changes a cluster
invoice.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_COUNTERS = {
    # data-sized shuffles (BroadcastExchange counted separately)
    "shuffles": re.compile(r"\bExchange (?:hash|range|SinglePartition)",
                           re.IGNORECASE),
    "broadcasts": re.compile(r"\bBroadcastExchange\b"),
    "scans": re.compile(r"\bFileScan\b|\bBatchScan\b"),
    "sort_merge_joins": re.compile(r"\bSortMergeJoin\b"),
    "broadcast_joins": re.compile(
        r"\bBroadcastHashJoin\b|\bBroadcastNestedLoopJoin\b"),
    "python_evals": re.compile(
        r"\bBatchEvalPython\b|\bArrowEvalPython\b|\bMapInPandas\b|"
        r"\bFlatMapGroupsInPandas\b"),
    "topk_heaps": re.compile(r"\bTakeOrderedAndProject\b"),
    "global_sorts": re.compile(r"\bSort \[.*\], true,"),
}


def plan_stats(df: DataFrame) -> dict:
    """Counters over the EXECUTED physical plan (post-AQE where
    applicable): shuffles, broadcasts, scans, join strategies, codegen
    spans, Python eval nodes, top-k heaps, global sorts, plus whether
    any pushed filter reached a scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {name: len(rx.findall(plan)) for name, rx in _COUNTERS.items()}
    out["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    out["has_pushed_filters"] = bool(
        re.search(r"PushedFilters: \[[^\]]", plan))
    return out


def assert_plan(df: DataFrame, max_shuffles: int | None = None,
                forbid_sort_merge: bool = False,
                forbid_python: bool = False,
                require_broadcast: bool = False,
                require_topk_heap: bool = False) -> dict:
    """Raise AssertionError (with the counters) when the plan violates
    the stated shape — the CI guard form of ``plan_stats``."""
    s = plan_stats(df)
    if max_shuffles is not None and s["shuffles"] > max_shuffles:
        raise AssertionError(f"{s['shuffles']} shuffles > {max_shuffles}: {s}")
    if forbid_sort_merge and s["sort_merge_joins"]:
        raise AssertionError(f"SortMergeJoin present: {s}")
    if forbid_python and s["python_evals"]:
        raise AssertionError(f"Python eval in plan: {s}")
    if require_broadcast and not (s["broadcasts"] or s["broadcast_joins"]):
        raise AssertionError(f"no broadcast in plan: {s}")
    if require_topk_heap and not s["topk_heaps"]:
        raise AssertionError(f"no TakeOrderedAndProject: {s}")
    return s
