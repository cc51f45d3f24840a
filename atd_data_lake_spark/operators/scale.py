"""Scale-awareness helpers.

``fan_out`` guards CPU-heavy per-row operators (shingling, hashing,
vector math, Arrow-batched UDFs) against under-split inputs.  A parquet
file is splittable only at row-group boundaries, so a small file (or a
single-row-group file, like the sf0.x test tables) scans as ONE task and
serializes everything downstream.  On a production table (100 TB, many
files/row groups) the scan already yields >= cores partitions and this
is a no-op — the partition check costs one driver-side metadata pass,
no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than the
    cluster's default parallelism (or ``min_partitions``).  The shuffle it
    introduces is proportional to the *input* (cheap) and buys full-width
    execution of the expensive operator that follows."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # JVM-side physical-RDD partition count: ~20x cheaper than df.rdd
    # (which builds the Python-serialization RDD wrapper just to ask)
    n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Cache-scope tracking (shared across operator modules)
# ---------------------------------------------------------------------------

import contextlib
import threading

# Per-THREAD scope stack: two threads running queries concurrently must
# not register persists into each other's innermost scope (which would
# unpersist frames the other thread is still computing on).
_SCOPE_TLS = threading.local()


def _cache_scopes() -> list[list[DataFrame]]:
    scopes = getattr(_SCOPE_TLS, "scopes", None)
    if scopes is None:
        scopes = _SCOPE_TLS.scopes = []
    return scopes


@contextlib.contextmanager
def tracked_caches():
    """Collects every persist an enclosed operator call creates (any
    operator module that persists through :func:`scoped_persist`) and
    unpersists them on exit — materialize results INSIDE the block::

        with tracked_caches():
            out = minhash_near_dups(docs).collect()

    Scopes nest (inner scope owns its own persists).  Outside any scope,
    operators persist untracked, and the session-level
    ``spark.catalog.clearCache()`` discipline applies (what ``bench.py``,
    the sweep scripts, and ``plan_report`` do)."""
    scopes = _cache_scopes()
    reg: list[DataFrame] = []
    scopes.append(reg)
    try:
        yield reg
    finally:
        scopes.pop()
        for frame in reg:
            frame.unpersist()


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers with the innermost
    :func:`tracked_caches` scope, so many-query sessions can reclaim
    operator-internal caches without a global ``clearCache()``."""
    df = df.persist()
    scopes = _cache_scopes()
    if scopes:
        scopes[-1].append(df)
    return df
