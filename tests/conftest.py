from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from atd_data_lake_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # spark.default.parallelism=4: createDataFrame over a local list
    # parallelizes into defaultParallelism slices (32 on this box), so
    # every tiny literal frame ran 32 Python partition computations per
    # job — a measured 4.7 s PER one-row txlog commit when coalesce(1)
    # serialized them into one task (5.7 s → 0.5 s with 1 slice).  Tests
    # assert behavior, not partition counts (the one count assertion is
    # archive-driven), and production sessions are untouched.
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
