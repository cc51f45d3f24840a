"""Grid-bucketed spatial radius join.

The 2D analog of the time-window band join (operators/rangejoin.py):
"pairs within distance R" is an inequality predicate Spark would
execute as a nested loop, so it is rewritten as an equi-join on
fixed-size grid cells:

1. quantize (x, y) to an R-wide integer grid — every true pair within
   R lives in the same cell or one of the 8 neighbors;
2. explode the LEFT side to its 3×3 cell neighborhood; the right side
   keeps its single home cell;
3. hash-join on the cell id (a plain shuffled equi-join);
4. re-apply the exact distance predicate to drop false candidates.

Each true pair matches on exactly ONE cell (the right row's home), so
no de-duplication step is needed.  Candidate volume is bounded by cell
population (points per R×R square), not n² — the property that makes
the join runnable on a planet-scale point set.  Grid arithmetic floors
via integer math on scaled coordinates, so bucketing is exact and
engine-portable.

This generalizes the reference's haversine-nearest device match (J10,
`fuzzy_device_match`'s 300 ft cascade stage, which can broadcast its
10²-row device dims): radius_join is the scale path when BOTH sides are
large.  Distance here is planar euclidean — correct for the
city-scale extents the reference works at; swap in
``functions.geo.haversine_feet`` for continental extents (same plan,
different exact-filter expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(x, y, r: float):
    """Integer grid cell ids for an r-wide grid.  floor of the float
    quotient: a boundary-ulp misplacement moves a point one cell over,
    which the 3×3 neighbor explosion absorbs — both sides compute the
    same home cell from the same expression, so candidates never drop."""
    sx = F.floor(x / F.lit(r)).cast("long")
    sy = F.floor(y / F.lit(r)).cast("long")
    return sx, sy


def radius_join(
    left: DataFrame,
    right: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 1.0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with euclidean distance ≤ ``radius``.

    Output: every left column prefixed ``left_prefix``, every right
    column prefixed ``right_prefix``, plus ``dist``.  Self-join callers
    filter ``l_id < r_id`` afterwards for unordered pairs.
    """
    lx, ly = F.col(left_prefix + x_col), F.col(left_prefix + y_col)
    rx, ry = F.col(right_prefix + x_col), F.col(right_prefix + y_col)

    l = left.select(
        *[F.col(c).alias(left_prefix + c) for c in left.columns]
    )
    r = right.select(
        *[F.col(c).alias(right_prefix + c) for c in right.columns]
    )

    lcx, lcy = _cell(lx, ly, radius)
    rcx, rcy = _cell(rx, ry, radius)
    l = l.withColumn(
        "_cell",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dx: F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dy: F.struct(
                            (lcx + dx).alias("cx"), (lcy + dy).alias("cy")
                        ),
                    ),
                )
            )
        ),
    )
    r = r.withColumn("_cell", F.struct(rcx.alias("cx"), rcy.alias("cy")))

    dist = F.sqrt(
        (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    )
    return (
        l.join(r, "_cell")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(radius))
        .drop("_cell")
    )
