"""J1 — the incremental anti-join, the reference's core engine loop.

Reference semantics (support/last_update.py:79-121, `_CompareTarget.isWithin`
:52-75, invoked support/etl_app.py:257-285): compare a *source* listing
against a *target* listing keyed by ``id_base`` (optionally
``(id_base, id_ext)``); a source item dated ``[date, date_end)`` is
"already done" iff some target item's interval overlaps it; emit only the
missing items — unless ``force``, which re-emits everything.  A NULL
``date_end`` means date + 1 day (support/last_update.py:65-75,
docs/tech_architecture.md:150-151).

Spark-first design: one left-anti join with an interval-overlap condition.
At 100 TB the source/target listings are catalog tables (small relative to
data, millions of rows at most) — the anti-join is a broadcast or a single
shuffle on ``id_base``; no per-item driver loop exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_effective_end(df: DataFrame, date_col: str, end_col: str | None) -> DataFrame:
    """Materialize the NULL-end ⇒ +1 day rule into ``_eff_end``."""
    if end_col is None:
        return df.withColumn("_eff_end", F.col(date_col) + F.expr("INTERVAL 1 DAY"))
    return df.withColumn(
        "_eff_end",
        F.coalesce(F.col(end_col), F.col(date_col) + F.expr("INTERVAL 1 DAY")),
    )


def incremental_plan(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str] | None = None,
    date_col: str = "collection_date",
    end_col: str | None = "collection_end",
    force: bool = False,
    last_run_date=None,
) -> DataFrame:
    """Items present in ``source`` not yet covered by ``target``.

    ``key_cols`` defaults to ``["id_base"]`` (matching the reference's
    default compare identity; pass ``["id_base", "id_ext"]`` for
    per-file-kind granularity).  ``last_run_date`` reproduces the
    ``--last_run_date`` lower bound (etl_app.py:98-106): source items
    older than it are not reconsidered.  ``force`` reproduces ``-F``:
    skip the anti-join entirely and re-emit everything in range.
    """
    key_cols = key_cols or ["id_base"]
    src = _with_effective_end(source, date_col, end_col)
    if last_run_date is not None:
        src = src.filter(F.col(date_col) >= F.lit(last_run_date))
    if force:
        return src.drop("_eff_end")

    tgt = _with_effective_end(target, date_col, end_col).select(
        *[F.col(k).alias(f"_t_{k}") for k in key_cols],
        F.col(date_col).alias("_t_date"),
        F.col("_eff_end").alias("_t_end"),
    )
    # interval-overlap anti-join: covered iff src.date < t.end AND src.end > t.date
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_t_{k}"))
    cond = cond & (F.col(date_col) < F.col("_t_end")) & (F.col("_eff_end") > F.col("_t_date"))
    return src.join(tgt, cond, "left_anti").drop("_eff_end")


def maintain_daily_aggregate(
    existing_agg: DataFrame,
    batch: DataFrame,
    build_agg,
    day_col: str = "day",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance — the nightly
    rollup pattern the reference runs file-at-a-time (each ready/publish
    job recomputes exactly the days whose raw slices arrived,
    gs_ready_agg.py / the cron ordering in
    docs/appendix_deployconf.md:45-272):

    given the standing aggregate table and a new raw ``batch`` that
    carries the COMPLETE data for the days it contains (the lake's
    arrival contract: a day slice lands whole), replace those days'
    aggregate rows with ``build_agg(batch)`` and keep every other day's
    rows untouched.

    Plan: ``build_agg`` runs over the batch only (batch-sized shuffle);
    the standing table is pruned with a broadcast left-anti join on the
    batch's distinct day keys — at 100 TB the rewrite cost is
    O(touched days), never O(table), and with the aggregate stored
    partitioned by day the anti-join becomes partition pruning (cf.
    ``io/publish.merge_public_layer``).

    ``build_agg``: DataFrame → DataFrame, must emit ``day_col`` — the
    SAME function that built the standing table (the invariant
    maintained here: result ≡ build_agg(full_history ∪ batch), which is
    exactly what the oracle checks).
    """
    fresh = build_agg(batch)
    touched = fresh.select(day_col).distinct()
    kept = existing_agg.join(F.broadcast(touched), day_col, "left_anti")
    return kept.unionByName(fresh)
