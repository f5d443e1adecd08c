from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hadith_vector_search_spark.session import get_spark

    # Fewer cores/partitions for fast test startup; semantics identical.
    spark = get_spark("pytest", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    from hadith_vector_search_spark.testing import duckdb_connect_views

    return duckdb_connect_views(SF_SMOKE)
