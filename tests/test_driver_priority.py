"""Pins tools/gen_driver_priority.py semantics and keeps the committed
generated module fresh.

The staleness test is the forcing function that replaces the old
hand-maintained ``_DRIVER_PRIORITY`` chore: adding a registry query or a
new ``CORRECTNESS_r*.json`` makes the committed module stale, and this
test fails until ``python tools/gen_driver_priority.py`` is rerun — so
the driver's next 50-row sweep window can never silently re-check known
greens while new/red queries wait (the round-4 and round-5 staleness).
"""

from __future__ import annotations

import importlib.util
import os

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "..", "tools", "gen_driver_priority.py")

spec = importlib.util.spec_from_file_location("gen_driver_priority", TOOL)
gp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gp)


def test_build_priority_ordering(monkeypatch):
    registry = ["a", "b", "c", "d", "e", "f"]
    rounds = {
        1: {
            "a": {"err": None, "rows_match": True, "schema_match": True,
                  "hash_match": True},
            "b": {"err": None, "rows_match": True, "schema_match": True,
                  "hash_match": False},  # red at latest
            "e": {"err": "no_oracle", "spark_rows": 7},  # rows-only = green
        },
        2: {
            "c": {"err": None, "rows_match": True, "schema_match": True,
                  "hash_match": True},
        },
    }
    monkeypatch.setattr(gp, "load_rounds", lambda: rounds)
    # d, f never checked; b red; a/e stale (r1) before c (r2)
    assert gp.build_priority(registry, []) == ["b", "d", "f", "a", "e", "c"]
    # --front pulls a green-changed query ahead of never-checked
    assert gp.build_priority(registry, ["c"]) == ["b", "c", "d", "f", "a", "e"]


def test_red_wins_over_front(monkeypatch):
    rounds = {1: {"a": {"err": "boom"}}}
    monkeypatch.setattr(gp, "load_rounds", lambda: rounds)
    assert gp.build_priority(["a", "b"], ["a"]) == ["a", "b"]


def test_rows_only_without_rows_is_red(monkeypatch):
    rounds = {1: {"a": {"err": "no_oracle", "spark_rows": None}}}
    monkeypatch.setattr(gp, "load_rounds", lambda: rounds)
    assert gp.build_priority(["a", "b"], []) == ["a", "b"]


def test_committed_module_is_fresh():
    """Fails whenever registry/CORRECTNESS changed without regenerating —
    run ``python tools/gen_driver_priority.py`` and commit the module."""
    from atd_data_lake_spark.queries import QUERIES
    from atd_data_lake_spark._driver_priority import DRIVER_PRIORITY

    expected = gp.build_priority(list(QUERIES), [])
    # A front-extra regeneration is also fresh: same membership, red block
    # still first.  Compare as ordered-membership plus red-front invariant.
    assert set(DRIVER_PRIORITY) == set(expected), (
        "generated module out of sync with registry/CORRECTNESS union — "
        "rerun tools/gen_driver_priority.py"
    )
    latest = gp.classify(list(QUERIES), gp.load_rounds())
    reds = [q for q in QUERIES if q in latest and not latest[q][1]]
    nevers = [q for q in QUERIES if q not in latest]
    k = len(reds) + len(nevers)
    assert set(DRIVER_PRIORITY[:k]) >= set(reds), (
        f"latest-red queries {reds} must sit in the front block"
    )
    assert set(DRIVER_PRIORITY[: k + 50]) >= set(nevers[:50]), (
        "never-driver-checked queries must sit inside the sweep window"
    )
