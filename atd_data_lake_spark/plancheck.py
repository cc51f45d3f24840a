"""Physical-plan string accounting shared by tools/plan_report.py and
tests/test_plan_budgets.py.

A frame persisted once but referenced N times prints its cached child
plan under EVERY InMemoryRelation occurrence, so naive substring counts
charge N× the exchanges/scans the runtime actually executes (the cache
materializes once).  ``dedupe_cached`` keeps one copy of each distinct
cached subtree — normalized by stripping the tree-drawing prefix,
expression ids, and plan ids — recursively, since a cached plan may
itself reference another cached frame.
"""

from __future__ import annotations

import re


def _depth(s: str) -> int:
    return re.match(r"^[\s:+\-]*", s).end()


def dedupe_cached(plan: str) -> str:
    """Collapse repeated InMemoryRelation child-plan printouts."""
    out_lines: list[str] = []
    seen: set[str] = set()
    lines = plan.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        out_lines.append(line)
        i += 1
        if "InMemoryRelation" in line:
            d = _depth(line)
            block = []
            while i < len(lines) and _depth(lines[i]) > d:
                block.append(lines[i])
                i += 1
            norm = "\n".join(re.sub(r"^[\s:+\-]*", "", b) for b in block)
            norm = re.sub(r"#\d+", "#x", norm)
            norm = re.sub(r"plan_id=\d+", "plan_id=x", norm)
            if norm not in seen:
                seen.add(norm)
                out_lines.append(dedupe_cached("\n".join(block)))
    return "\n".join(out_lines)


def count_exchanges(df) -> int:
    """Exchange nodes the runtime will actually execute (deduped)."""
    plan = dedupe_cached(df._jdf.queryExecution().executedPlan().toString())
    return len(re.findall(r"\bExchange\b", plan))
