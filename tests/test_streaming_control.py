"""Unit tests for streaming/control.stop_after_data_batch lifecycle.

Uses a fake query object — the logic under test is pure polling/ control
flow, no SparkSession required.  Covers the two failure modes from the
round-3 advice: (1) a no-data housekeeping batch overwriting
lastProgress inside the poll gap must not hide the committed data batch
(recentProgress scan), and (2) a lapsed deadline with no data batch must
raise instead of silently serving a possibly-incomplete sink.
"""

from __future__ import annotations

import pytest

from atd_data_lake_spark.streaming.control import stop_after_data_batch


class FakeQuery:
    def __init__(self, progresses, active=True, stop_raises=None):
        self.recentProgress = progresses
        self.isActive = active
        self._stop_raises = stop_raises
        self.stopped = False

    @property
    def lastProgress(self):
        return self.recentProgress[-1] if self.recentProgress else None

    def stop(self):
        self.stopped = True
        if self._stop_raises:
            raise self._stop_raises

    def awaitTermination(self, timeout=None):
        return True


def test_data_batch_hidden_behind_housekeeping_batch():
    """lastProgress shows the no-data eviction batch, but the data batch
    sits earlier in recentProgress — must stop cleanly, not spin."""
    q = FakeQuery([{"numInputRows": 42}, {"numInputRows": 0}])
    stop_after_data_batch(q, timeout_s=1.0)
    assert q.stopped


def test_deadline_without_data_raises_timeout():
    q = FakeQuery([{"numInputRows": 0}])
    with pytest.raises(TimeoutError, match="did not commit a data batch"):
        stop_after_data_batch(q, timeout_s=0.5)
    assert q.stopped  # stopped before raising — no zombie query


def test_inactive_query_without_data_does_not_raise_timeout():
    """A query that terminated on its own (availableNow drained with
    genuinely zero input) exits the poll via isActive, not the deadline
    — stop() is a no-op and no TimeoutError fires."""
    q = FakeQuery([], active=False)
    stop_after_data_batch(q, timeout_s=0.5)
    assert q.stopped


def test_stop_race_swallowed_only_after_data_batch():
    from pyspark.errors import StreamingQueryException

    def exc():
        try:
            raise StreamingQueryException("XXKST stop race", "", "", "")
        except TypeError:
            return StreamingQueryException("XXKST stop race")

    try:
        e = StreamingQueryException("XXKST stop race", "", "", "")
    except TypeError:
        e = StreamingQueryException("XXKST stop race")

    # data batch committed -> the interrupt race is swallowed
    q_ok = FakeQuery([{"numInputRows": 7}], stop_raises=e)
    stop_after_data_batch(q_ok, timeout_s=1.0)
    assert q_ok.stopped

    # no data batch, query died -> the failure is real and re-raises
    q_bad = FakeQuery([{"numInputRows": 0}], active=False, stop_raises=e)
    with pytest.raises(StreamingQueryException):
        stop_after_data_batch(q_bad, timeout_s=1.0)
