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


@pytest.fixture(autouse=True)
def _cold_cache_between_tests():
    """Clear the CacheManager after every test (ADVICE r08).

    Iterative operators pin loop-invariant tables via
    durability.pin_partitioned and deliberately leave them cached for
    the session (bench.py clears between queries); in the session-scoped
    pytest Spark those pins would otherwise accumulate, and CacheManager
    plan substitution would make plan-shape assertions test-order
    dependent. Cached data recomputes lazily, so this only costs the
    (tiny, sf0.001) recompute when a later test touches the same table.
    """
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            s.catalog.clearCache()
        except Exception:
            pass


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
