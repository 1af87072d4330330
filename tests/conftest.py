from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powergraph_spark.session import get_spark  # noqa: E402

# The reference's 5-vertex / 7-edge parser fixture
# (/root/reference/tests/test_parsers.cpp:30-76, tests/data/test_tsv).
REF_EDGES = [(0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0), (3, 5)]
REF_VERTICES = {0, 1, 2, 3, 5}


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="powergraph-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
