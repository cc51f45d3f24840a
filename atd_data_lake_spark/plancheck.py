"""Physical-plan accounting shared by tools/plan_report.py and
tests/test_plan_budgets.py.

A frame persisted once but referenced N times prints its cached child
plan under EVERY InMemoryRelation occurrence, so naive substring counts
charge N× the exchanges/scans the runtime actually executes (the cache
materializes once).

Two accounting paths:

- ``count_exchanges`` / ``count_python_stages`` (the budget gates)
  walk the JVM plan tree and key cached subtrees on their
  ``CachedRDDBuilder`` identity — the object the runtime itself dedups
  on.  String normalization CANNOT do this correctly: the printed child
  plan of two *different* caches with identical structure carries the
  same original expr ids (verified on Spark 4: both print
  ``Project [id#0L, ...]``), while a *re-reference* of one cache is
  re-aliased by DeduplicateRelations — so the string alone can neither
  split distinct-but-identical caches nor merge self-join
  re-references.  Exchanges are ADDITIONALLY deduplicated by
  ``semanticHash`` because AQE's stage cache reuses canonically-equal
  shuffles at runtime; Python map stages are NOT — Spark has no reuse
  mechanism for them (only ReuseExchange/ReuseSubquery), so a
  duplicated un-persisted Arrow stage genuinely runs once per
  occurrence and is counted that way.
- ``dedupe_cached`` (display only, tools/plan_report.py) collapses
  repeated InMemoryRelation printouts by normalized structure.  It can
  under-report a genuinely duplicated identical-structure cache — fine
  for a human-readable report, not for the budget gate.  The seen set
  threads through the recursion so a nested cache referenced under two
  distinct outer caches is still printed only once.
"""

from __future__ import annotations

import re


def _depth(s: str) -> int:
    return re.match(r"^[\s:+\-]*", s).end()


def dedupe_cached(plan: str, _seen: set[str] | None = None) -> str:
    """Collapse repeated InMemoryRelation child-plan printouts (display)."""
    out_lines: list[str] = []
    seen: set[str] = _seen if _seen is not None else set()
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
                out_lines.append(dedupe_cached("\n".join(block), seen))
    return "\n".join(out_lines)


def count_exchanges(df) -> int:
    """Distinct shuffle exchanges the runtime will actually MATERIALIZE.

    Walks the JVM plan tree (not the printout) and counts
    ``ShuffleExchangeExec`` nodes deduplicated two ways, both mirroring
    what the engine itself deduplicates:

    - cached subtrees by ``CachedRDDBuilder`` identity — a frame
      persisted once but referenced N times contributes its shuffles
      once (the cache materializes once);
    - canonically-equal exchanges by ``semanticHash``, scoped PER PLAN
      ROOT (the main plan, or one cached plan) — AQE's stage cache
      (``spark.sql.exchange.reuse``) materializes one shuffle and wraps
      every other occurrence in ReusedExchange, so a subtree the
      optimizer duplicated (e.g. a multi-branch union re-reading one
      grouped frame) still shuffles once at runtime.  But that reuse
      lives inside ONE physical plan execution: each cache materializes
      in its own job with its own plan, so a canonically-equal shuffle
      appearing under two DIFFERENT cached-plan roots (or under a cache
      and the main plan) executes once per root and is counted per root
      (ADVICE r5 — the global seen-set undercounted this case).

    Broadcast exchanges are deliberately NOT counted — budgets track
    shuffles.  Descends through AQE wrappers, query stages, subqueries,
    and nested caches; every JVM accessor is defensive, and a shuffle
    whose ``semanticHash`` call fails is counted as unique (overcount,
    never undercount)."""
    return _count_distinct_nodes(
        df, ("ShuffleExchangeExec",), semantic_dedup=True
    )


def count_python_stages(df) -> int:
    """Arrow/Python stages the runtime will actually run: cache-identity
    dedup only (a frame persisted once runs its MapInPandas once,
    however many consumers print its lineage) — NO semanticHash dedup,
    because Spark has no stage-reuse for map stages: a duplicated
    un-persisted Arrow subtree executes once per occurrence."""
    return _count_distinct_nodes(
        df,
        (
            "MapInPandasExec",
            "ArrowEvalPythonExec",
            "FlatMapGroupsInPandasExec",
            "FlatMapGroupsInPandasWithStateExec",
            "BatchEvalPythonExec",
        ),
        semantic_dedup=False,
    )


def _count_distinct_nodes(
    df, class_names: tuple[str, ...], semantic_dedup: bool
) -> int:
    # semanticHash dedup is keyed by (scope, cls, hash): scope 0 is the
    # main plan; each distinct CachedRDDBuilder's cached plan gets its
    # own scope, because exchange reuse only happens within one physical
    # plan execution — a cache materializes in its own job, so an equal
    # shuffle under two roots runs twice and must count twice.
    matched_hashes: set[tuple[int, str, int]] = set()
    unkeyed = 0
    builders: list = []  # distinct CachedRDDBuilder jobjs
    stack = [(df._jdf.queryExecution().executedPlan(), 0)]
    while stack:
        n, scope = stack.pop()
        try:
            cls = n.getClass().getSimpleName()
        except Exception:
            continue
        if cls == "InMemoryTableScanExec":
            try:
                rel = n.relation()
                b = rel.cacheBuilder()
                if not any(ob.equals(b) for ob in builders):
                    builders.append(b)
                    # caches can nest; each cache root is its own scope
                    stack.append((rel.cachedPlan(), len(builders)))
            except Exception:
                pass
            continue
        if cls in class_names:
            if not semantic_dedup:
                unkeyed += 1
            else:
                try:
                    matched_hashes.add((scope, cls, n.semanticHash()))
                except Exception:
                    unkeyed += 1
        if cls == "AdaptiveSparkPlanExec":
            try:
                stack.append((n.executedPlan(), scope))
            except Exception:
                pass
        elif cls.endswith("QueryStageExec"):
            try:
                stack.append((n.plan(), scope))
            except Exception:
                pass
        try:
            ch = n.children()
            for i in range(ch.size()):
                stack.append((ch.apply(i), scope))
        except Exception:
            pass
        try:
            sq = n.subqueries()
            for i in range(sq.size()):
                stack.append((sq.apply(i), scope))
        except Exception:
            pass
    return len(matched_hashes) + unkeyed
