"""J8 / J9 — as-of joins.

Reference semantics:
- *backward* (J8): per ``id_base``, pick the latest site.json whose date
  ≤ the item's date (support/catalog.py:123-188 getForPrevDate/_getForDate,
  used gs_json_standard.py:75, gs_ready.py:123).
- *forward* (J9): pick the *closest future* unit-data snapshot ≥ date
  (support/unitdata.py:40-63; docs/datasrc_wt.md:58).

Spark-first design: a range-condition join + per-left-row best-match
selection via ``max_by``/``min_by`` aggregation (NOT a row_number
window: an aggregate gets map-side partial aggregation, so the matches
a broadcast join emits for one left row — all in one task — collapse
to a single row before the shuffle, and nothing is ever sorted).  The
dimension side (site files / unit-data snapshots: one row per
(entity, day)) is tiny relative to fact data, so it is broadcast and
the fact side never shuffles pre-join.  For a dimension too big to
broadcast, drop the broadcast hint and the same plan degrades to one
shuffled join — still no driver loop (the reference's bisect search,
support/catalog.py:63-74, is subsumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    how: str = "left",
    tolerance=None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Join each left row to the single right row closest in time.

    direction="backward": right_ts ≤ left_ts, pick max(right_ts) (J8).
    direction="forward":  right_ts ≥ left_ts, pick min(right_ts) (J9).
    direction="nearest":  pick min |right_ts − left_ts|; distance ties
        break to the EARLIER right_ts (backward preference), then the
        remaining right columns — a deterministic total order.
    ``tolerance``: optional max time distance (Column interval expr).
        Strongly recommended with "nearest": it bounds the candidate
        set the time condition would otherwise leave unbounded.
    ``how``: "left" keeps unmatched left rows; "inner" drops them.

    Right value columns keep their names unless they collide with a left
    column, in which case they get a ``_right`` suffix.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )

    right_cols = [c for c in right.columns if c not in on]
    r = right.select(*on, *[F.col(c).alias(f"_r_{c}") for c in right_cols])
    ts_col = f"_r_{right_ts}"

    if direction == "backward":
        cond = F.col(ts_col) <= F.col(left_ts)
        if tolerance is not None:
            cond = cond & (F.col(ts_col) >= F.col(left_ts) - tolerance)
    elif direction == "forward":
        cond = F.col(ts_col) >= F.col(left_ts)
        if tolerance is not None:
            cond = cond & (F.col(ts_col) <= F.col(left_ts) + tolerance)
    else:  # nearest: symmetric band (or unbounded when no tolerance)
        cond = F.lit(True)
        if tolerance is not None:
            cond = (F.col(ts_col) >= F.col(left_ts) - tolerance) & (
                F.col(ts_col) <= F.col(left_ts) + tolerance
            )

    left_tagged = left.withColumn("_l_uid", F.monotonically_increasing_id())
    jc = cond
    for k in on:
        jc = (left_tagged[k] == r[k]) & jc
    rside = F.broadcast(r) if broadcast_right else r
    joined = left_tagged.join(rside, jc, "left")

    # argmax/argmin by (ts, remaining right cols): the struct key gives a
    # deterministic total order on ts ties; NULL keys (unmatched left
    # rows) are ignored by min_by/max_by, yielding a NULL payload — the
    # left-join semantics fall out for free
    payload = F.struct(*[F.col(f"_r_{c}").alias(c) for c in right_cols])
    if direction == "nearest":
        # distance in integer epoch µs (NTZ-safe via instant relabeling),
        # then (earlier ts, remaining cols) as the deterministic tiebreak
        from atd_data_lake_spark.functions.datetime_fns import as_instant

        l_us = F.unix_micros(as_instant(left, left_ts))
        r_us = F.unix_micros(
            F.to_utc_timestamp(F.col(ts_col), "UTC")
            if "ntz" in str(right.schema[right_ts].dataType).lower()
            else F.col(ts_col)
        )
        key = F.struct(
            F.abs(r_us - l_us),
            F.col(ts_col),
            *[F.col(f"_r_{c}") for c in right_cols if c != right_ts],
        )
        pick = F.min_by(payload, key)
    else:
        key = F.struct(
            F.col(ts_col),
            *[F.col(f"_r_{c}") for c in right_cols if c != right_ts],
        )
        pick = (
            F.max_by(payload, key)
            if direction == "backward"
            else F.min_by(payload, key)
        )
    best = joined.groupBy("_l_uid", *[left_tagged[c] for c in left.columns]).agg(
        pick.alias("_best")
    )
    out = best
    if how == "inner":
        out = out.filter(F.col(f"_best.{right_ts}").isNotNull())
    for c in right_cols:
        target = c if c not in left.columns else f"{c}_right"
        out = out.withColumn(target, F.col(f"_best.{c}"))
    return out.drop("_best", "_l_uid")
