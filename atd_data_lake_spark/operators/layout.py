"""Data-layout operators: multi-dimensional clustering keys (Z-order).

Beyond-reference extension (BASELINE.json north star).  The reference
orders files one-dimensionally by date (`drivers/storage_s3.py:36-48`
year/month/day key scheme), which prunes date predicates but nothing
else.  A 100 TB lake queried by BOTH time and entity (sensor, user,
geo cell) wants its files clustered on an interleaved key so min/max
footer statistics prune on every dimension at once — the same idea
Delta Lake's OPTIMIZE ZORDER BY implements (PAPERS.md VLDB'20 §3.3).

This module computes the Morton (Z-order) key as a pure JVM column
expression — bit interleaving via the standard shift-and-mask spread,
no UDF — so `df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)`
lays files out z-clustered with zero Python cost at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number spread of an 8-bit value into 16 bits (bits to even
# positions): the classic "Interleave bits by Binary Magic Numbers"
# (Sean Anderson's Bit Twiddling Hacks — public domain), expressed as
# (shift, mask) rounds usable in any engine with <<, |, &.
_SPREAD8: list[tuple[int, int]] = [
    (4, 0x0F0F),
    (2, 0x3333),
    (1, 0x5555),
]


def _spread8(c: Column) -> Column:
    """Spread the low 8 bits of ``c`` so bit i lands at position 2i."""
    out = c.bitwiseAND(F.lit(0xFF))
    for shift, mask in _SPREAD8:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def morton_key_8x8(x: Column, y: Column) -> Column:
    """16-bit Morton key of two 8-bit bucket ids: y7x7 y6x6 … y0x0.

    ``x`` occupies the even bit positions, ``y`` the odd.  Inputs are
    masked to 8 bits; callers bucket real columns first (e.g.
    ``F.hash(col) & 255`` for entities, epoch-time scaled for time).
    """
    return _spread8(x).bitwiseOR(F.shiftleft(_spread8(y), 1))


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    key_name: str = "zkey",
) -> DataFrame:
    """Attach the Morton key column; the write path then range-partitions
    and sorts on it so each output file covers a compact z-region (tight
    per-file min/max on BOTH source dimensions)."""
    return df.withColumn(key_name, morton_key_8x8(x, y))
