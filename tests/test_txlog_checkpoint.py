"""io/txlog.py log checkpointing (VERDICT r7 item 5): snapshot
resolution must cost O(checkpoint interval), not O(history), and the
checkpoint must be an accelerator only — never a second source of
truth."""

from __future__ import annotations

import json
import os

import pytest

from atd_data_lake_spark.io import txlog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(autouse=True)
def _small_interval(monkeypatch):
    """Every assertion here is INTERVAL-RELATIVE (checkpoints land at
    k·interval, replay reads ≤ interval commits, index covers versions ≤
    newest checkpoint), so a 4-commit interval exercises exactly the same
    arithmetic as the production 10 with ~2.5× fewer one-row commit jobs
    — this file was 555 s of the suite's 44 min, and the driver's pytest
    window was timing out at 96% (r9 verdict item 1)."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_INTERVAL", 4)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _append_n(spark, table, n, start=0):
    for i in range(start, start + n):
        txlog.append(
            spark.createDataFrame(
                [(i, f"v{i}")], "k long, v string"
            ).coalesce(1),
            table,
        )


def test_auto_checkpoint_written_every_interval(spark, table):
    n = txlog._CHECKPOINT_INTERVAL * 2 + 5
    _append_n(spark, table, n)
    ckpts = txlog._list_checkpoints(txlog._canon(table))
    # one checkpoint at every multiple of the interval ≤ n (the old
    # hard-coded [interval, 2·interval] only held while 2·interval + 5
    # < 3·interval, i.e. interval > 5)
    assert ckpts == list(
        range(txlog._CHECKPOINT_INTERVAL, n + 1, txlog._CHECKPOINT_INTERVAL)
    )
    with open(
        txlog._checkpoint_file(
            txlog._canon(table), txlog._CHECKPOINT_INTERVAL
        )
    ) as f:
        ck = json.load(f)
    assert ck["version"] == txlog._CHECKPOINT_INTERVAL
    assert len(ck["active"]) > 0


def test_reads_touch_at_most_interval_commits(spark, table, monkeypatch):
    """The O(versions) replay is gone: resolving HEAD of a 25-commit
    table reads ≤ (interval) commit JSONs after the newest checkpoint."""
    n = txlog._CHECKPOINT_INTERVAL * 2 + 5  # 25 commits, ckpts at 10, 20
    _append_n(spark, table, n)
    reads: list[int] = []
    real = txlog._read_commit

    def counting(t, v):
        reads.append(v)
        return real(t, v)

    monkeypatch.setattr(txlog, "_read_commit", counting)
    files = txlog.snapshot_files(table)
    assert len(files) == n
    assert len(reads) <= txlog._CHECKPOINT_INTERVAL
    # and only commits ABOVE the newest checkpoint were replayed
    assert min(reads) > txlog._CHECKPOINT_INTERVAL * 2


def test_checkpointed_read_equals_full_replay(spark, table):
    n = txlog._CHECKPOINT_INTERVAL + 3
    _append_n(spark, table, n)
    # some churn across the checkpoint boundary: merge + delete
    txlog.merge(
        spark,
        table,
        spark.createDataFrame([(0, "V0"), (99, "new")], "k long, v string"),
        on=["k"],
    )
    txlog.delete_keys(
        spark, table, spark.createDataFrame([(1,)], "k long"), on=["k"]
    )
    with_ckpt = _rows(txlog.read_table(spark, table))

    # destroy every checkpoint → force the full replay path
    canon = txlog._canon(table)
    for v in txlog._list_checkpoints(canon):
        os.unlink(txlog._checkpoint_file(canon, v))
    assert _rows(txlog.read_table(spark, table)) == with_ckpt
    expected = [(i, f"v{i}") for i in range(2, n)] + [(0, "V0"), (99, "new")]
    assert with_ckpt == sorted(expected)


def test_time_travel_below_checkpoint_still_works(spark, table):
    n = txlog._CHECKPOINT_INTERVAL + 2
    _append_n(spark, table, n)
    # version 3 predates the checkpoint at 10: replay must start from
    # scratch, not from a checkpoint AFTER the requested version
    snap = txlog.read_table(spark, table, version=3)
    assert _rows(snap) == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_corrupt_checkpoint_falls_back_to_full_replay(spark, table):
    n = txlog._CHECKPOINT_INTERVAL + 1
    _append_n(spark, table, n)
    canon = txlog._canon(table)
    with open(
        txlog._checkpoint_file(canon, txlog._CHECKPOINT_INTERVAL), "w"
    ) as f:
        f.write("{ not json")
    assert len(txlog.snapshot_files(table)) == n
    assert _rows(txlog.read_table(spark, table)) == [
        (i, f"v{i}") for i in range(n)
    ]


def test_explicit_checkpoint_and_vacuum_compose(spark, table):
    _append_n(spark, table, 3)
    v = txlog.write_checkpoint(table)
    assert v == 3
    assert txlog._list_checkpoints(txlog._canon(table)) == [3]
    # compaction + vacuum after a checkpoint: reads stay correct even
    # though the checkpointed file list references vacuumed files for
    # OLD versions (HEAD resolution replays past them)
    txlog.compact(spark, table, target_files=1)
    txlog.write_checkpoint(table)
    deleted = txlog.vacuum(table, keep_versions=1, min_age_seconds=0.0)
    assert deleted
    assert _rows(txlog.read_table(spark, table)) == [
        (0, "v0"), (1, "v1"), (2, "v2"),
    ]


def test_checkpoint_requires_a_commit(table):
    with pytest.raises(ValueError):
        txlog.write_checkpoint(table)


def test_commit_id_lookup_uses_checkpoint_index(spark, table, monkeypatch):
    """The idempotency walk is O(interval) too: an ABSENT commit_id must
    not read version files below the newest checkpoint, and a REPLAYED
    id older than the checkpoint resolves through the index."""
    n = txlog._CHECKPOINT_INTERVAL + 4
    for i in range(n):
        txlog.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string")
            .coalesce(1),
            table,
            commit_id=f"batch-{i}",
        )
    reads: list[int] = []
    real = txlog._read_commit

    def counting(t, v):
        reads.append(v)
        return real(t, v)

    monkeypatch.setattr(txlog, "_read_commit", counting)
    assert txlog._commit_id_exists(txlog._canon(table), "nope") is None
    assert len(reads) <= n - txlog._CHECKPOINT_INTERVAL
    assert all(v > txlog._CHECKPOINT_INTERVAL for v in reads)
    # an id below the checkpoint resolves via the index (version 2),
    # and the replay path returns a no-op success
    reads.clear()
    assert txlog._commit_id_exists(txlog._canon(table), "batch-1") == 2
    assert all(v > txlog._CHECKPOINT_INTERVAL for v in reads)
    res = txlog.append(
        spark.createDataFrame([(99, "dup")], "k long, v string").coalesce(1),
        table,
        commit_id="batch-1",
    )
    assert res.replayed and res.version == 2
    assert txlog.current_version(table) == n
