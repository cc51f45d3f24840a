"""Probabilistic membership / frequency sketches with EXACTLY
reproducible hashing — Bloom filter and count-min sketch built from
md5 double-hashing, so a SQL oracle can replay the identical bit
positions (the round-41 DDSketch trick extended from deterministic
bucketing to deterministic hashing).

Why these exist beside the exact operators:

- ``curation.decontaminate`` broadcasts the benchmark's DISTINCT
  shingle-hash set — 8 bytes per shingle, unbounded in the reference
  set's size.  Fine for an eval suite (thousands of docs); wrong when
  the "held-out" side is itself web-scale (dedup against a 10-billion-
  shingle reference corpus).  ``bloom_bitmap``/``bloom_probe`` replace
  the set with a CONSTANT-size bitmap (m bits chosen up front), the
  standard trade: membership becomes one-sided (false positives only
  ⇒ over-flagging, the conservative direction for decontamination),
  and the broadcast is 32 KB at m = 2¹⁸ regardless of the reference's
  cardinality.
- ``agg_heavy_hitters_mg`` (round 12) keeps exact-within-ε TOP items;
  a count-min sketch is the mergeable FREQUENCY table: d·w bounded
  counters answer "estimated count of ANY key" with est ≥ exact and
  ≤ exact + εN at 1−δ (Cormode & Muthukrishnan '05), the storable
  per-shard artifact that rolls up by cell-wise addition (same
  mergeability contract as the HLL and DDSketch rows).

Hashing: h1/h2 are the first/second 15 hex chars of md5(key) (60-bit
values, exact in BIGINT in both Spark and DuckDB), positions
p_i = (h1 + i·h2) mod m — Kirsch-Mitzenmacher double hashing, the
standard simulation of k independent hashes.  Everything is built-in
JVM expressions (md5/conv/substring/shift/bit_or): no Python UDFs.

Reference framing: the reference engine has no sketch layer at all —
its dedup/catalog presence checks are exact joins sized for nightly
batches (``atd_data_lake/core/catalog.py``); these operators are the
100 TB generalization of that membership contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bloom_positions_sql",
    "bloom_bitmap",
    "bloom_probe",
    "cms_positions_sql",
    "cms_counters",
    "cms_estimate",
]

_H1 = "CAST(conv(substring(md5({key}), 1, 15), 16, 10) AS BIGINT)"
_H2 = "CAST(conv(substring(md5({key}), 17, 15), 16, 10) AS BIGINT)"


def _h12(key_sql: str, m: int) -> tuple[str, str]:
    return (
        f"({_H1.format(key=key_sql)} % {m})",
        f"({_H2.format(key=key_sql)} % {m})",
    )


def bloom_positions_sql(key_sql: str, m: int, k: int) -> str:
    """SQL array expression of the k bit positions for a string key,
    p_i = (h1 + i·h2) mod m."""
    h1, h2 = _h12(key_sql, m)
    parts = ", ".join(f"({h1} + {i} * {h2}) % {m}" for i in range(k))
    return f"array({parts})"


def _array_lit(values: list[int]) -> Column:
    try:  # pyspark >= 3.4 accepts a list directly (single Literal node)
        return F.lit(values)
    except Exception:  # pragma: no cover — older lit()
        return F.array(*[F.lit(v) for v in values])


def bloom_bitmap(keys: DataFrame, key_col: str, m: int, k: int) -> list[int]:
    """Build the m-bit Bloom bitmap over a key column, returned as a
    driver-side list of m/64 longs (the broadcastable constant).

    Distributed build: positions explode map-side and ``bit_or`` packs
    them straight into ≤ m/64 (word, bits) rows — setting a bit twice
    is a no-op, so NO distinct pass is needed and the single exchange
    carries at most m/64 rows per task after partial aggregation.  The
    ONLY collect is that bounded word frame (4096 rows at m = 2¹⁸ by
    construction), never the keys.
    """
    if m % 64 != 0:
        raise ValueError(f"m must be a multiple of 64: {m}")
    words = (
        keys.select(
            F.explode(F.expr(bloom_positions_sql(key_col, m, k))).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_probe(
    df: DataFrame,
    bitmap: list[int],
    key_sql: str,
    m: int,
    k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: all k bit positions of the
    key are set in the LITERAL bitmap — one array literal shipped once
    with the task closure, no join, no shuffle, no per-row Python.

    The arithmetic-shift sign case is safe: for bit 63 the word is
    negative, ``shiftright`` sign-extends the HIGH bits, and ``& 1``
    reads bit 0 of the shifted value, which is the probed bit.
    """
    tmp = "_bloom_bits"
    tests = []
    for i in range(k):
        p = f"((_bh1 + {i} * _bh2) % {m})"
        tests.append(
            f"(shiftright(element_at({tmp}, CAST({p} / 64 AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1) = 1"
        )
    # md5 computed ONCE per row; h1/h2 parse substrings of that column
    return (
        df.withColumn(tmp, _array_lit(bitmap))
        .withColumn("_bmd5", F.expr(f"md5({key_sql})"))
        .withColumn(
            "_bh1",
            F.expr(
                f"CAST(conv(substring(_bmd5, 1, 15), 16, 10) AS BIGINT)"
                f" % {m}"
            ),
        )
        .withColumn(
            "_bh2",
            F.expr(
                f"CAST(conv(substring(_bmd5, 17, 15), 16, 10) AS BIGINT)"
                f" % {m}"
            ),
        )
        .withColumn(out_col, F.expr(" AND ".join(tests)))
        .drop(tmp, "_bmd5", "_bh1", "_bh2")
    )


def cms_positions_sql(key_sql: str, w: int, d: int) -> str:
    """SQL array of d struct(r, p) cells for a string key: row j probes
    p_j = (h1 + (j+1)·h2) mod w (offset by 1 so Bloom and CMS positions
    for the same key differ)."""
    h1, h2 = _h12(key_sql, w)
    parts = ", ".join(
        f"struct(CAST({j} AS INT) AS r, "
        f"CAST(({h1} + {j + 1} * {h2}) % {w} AS INT) AS p)"
        for j in range(d)
    )
    return f"array({parts})"


def cms_counters(keys: DataFrame, key_col: str, w: int, d: int) -> DataFrame:
    """The d×w count-min counter table as (r, p, cnt) rows — ONE
    map-side-combined aggregate over the stream (each input row emits d
    cells; partial aggregation collapses them to ≤ d·w rows per task
    before the shuffle), mergeable by cell-wise addition."""
    return (
        keys.select(F.explode(F.expr(cms_positions_sql(key_col, w, d))).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.p").alias("p"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    key_col: str,
    w: int,
    d: int,
) -> DataFrame:
    """Estimated count per probe key: min over the d counter cells the
    key hashes to.  The counter table (≤ d·w rows by construction) is
    broadcast; the probe side explodes ×d and never shuffles beyond
    the final per-key min-groupBy.

    LEFT join + coalesce-to-0: a probe key the build never touched has
    empty cells, and CMS's answer for it is 0 — an inner join would
    silently drop it (or, worse, min over only its COLLIDING cells and
    over-estimate).  Matters exactly when the probe side is a
    watchlist rather than the build's own key census (r8 review)."""
    cells = probes.select(
        key_col,
        F.explode(F.expr(cms_positions_sql(key_col, w, d))).alias("c"),
    ).select(key_col, F.col("c.r").alias("r"), F.col("c.p").alias("p"))
    return (
        cells.join(F.broadcast(counters), ["r", "p"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )
