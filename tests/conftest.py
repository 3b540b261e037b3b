from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from ushas_spark.session import get_spark  # noqa: E402

# Small SF for the fast unit loop; set USHAS_TEST_SF=/root/testdata/sf0.01
# to run the oracle harness at the driver's gate scale.
SF_DIR = os.environ.get("USHAS_TEST_SF", "/root/testdata/sf0.001")


def pytest_configure(config):
    # Registered here because the repo has no pytest.ini: xdist_group is
    # meaningful under pytest-xdist --dist loadgroup and harmless without.
    config.addinivalue_line(
        "markers",
        "xdist_group(name): pin tests to one pytest-xdist worker",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ushas-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
