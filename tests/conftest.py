from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_connected_components_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "pccs-tests",
        cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


# Golden fixture: /root/reference/data/test_small.mtx (6V, 5E, 2 components),
# 0-indexed per FIXTURES.md §3.
GOLDEN_EDGES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)]
GOLDEN_LABELS = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


@pytest.fixture()
def golden_edges(spark):
    return spark.createDataFrame(GOLDEN_EDGES, "src long, dst long")
