"""Lifecycle control for driver-executed Structured Streaming queries.

An ``availableNow`` query whose plan holds streaming state (a
stream-stream join's buffered sides, or a stateful operator with a
ProcessingTimeTimeout) does NOT self-terminate after the data drains:
MicroBatchExecution keeps scheduling no-data batches to advance the
watermark and fire timers (observed: ~30 min of empty-batch spin for a
30-minute session gap).  The executed registry queries therefore poll
for the data batch's commit and stop the query themselves.

``query.stop()`` interrupts whatever batch is in flight.  When that is
one of the no-data housekeeping batches mid-state-store-commit, the
interrupt surfaces as STREAM_FAILED (SQLSTATE XXKST) from
``awaitTermination`` — even though the data batch already committed its
complete output to the sink.  That race is why ``stop_after_data_batch``
swallows the exception ONLY once the data batch was observed committed;
a failure before that is a real query error and re-raises.
"""

from __future__ import annotations

import time

from pyspark.errors import StreamingQueryException


def stop_after_data_batch(query, timeout_s: float = 300.0) -> None:
    """Block until ``query``'s first data batch commits, then stop it.

    ``lastProgress`` is published only after a batch completes, so
    ``numInputRows > 0`` means the data batch (and its sink write) has
    committed — for single-file ``availableNow`` sources the sink then
    holds the query's entire deterministic output, and later no-data
    batches only evict state.  A ``StreamingQueryException`` raised by
    interrupting one of those housekeeping batches is swallowed; any
    failure before the data batch commits re-raises.
    """
    saw_data = False
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        # Scan recentProgress (retains ~100 entries), not just
        # lastProgress: a no-data housekeeping batch committing within
        # the poll gap overwrites lastProgress (numInputRows reads 0
        # thereafter) and would otherwise hide the data batch forever.
        if any(
            p and p.get("numInputRows", 0) > 0 for p in query.recentProgress
        ):
            saw_data = True
            break
        if not query.isActive:
            break
        time.sleep(0.2)
    if not saw_data:
        # One final re-scan before declaring a timeout: the data batch may
        # have committed during the last poll sleep (or the loop exited on
        # isActive=False after the final progress was published).  Without
        # this, a batch landing in the final 200 ms gap is misreported as
        # a timeout even though the sink is complete.
        saw_data = any(
            p and p.get("numInputRows", 0) > 0 for p in query.recentProgress
        )
    if not saw_data and query.isActive and time.time() >= deadline:
        # Deadline lapsed without ever observing the data batch: the
        # memory sink may hold incomplete output.  Stop the query, then
        # fail loudly instead of letting callers serve truncated rows.
        try:
            query.stop()
            query.awaitTermination(60)
        except StreamingQueryException:
            pass
        raise TimeoutError(
            f"streaming query did not commit a data batch within "
            f"{timeout_s}s; refusing to serve a possibly-incomplete sink"
        )
    try:
        query.stop()
        query.awaitTermination(60)
    except StreamingQueryException:
        if not saw_data:
            raise
