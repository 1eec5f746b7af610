import os
import sys

import pytest

# tests-dir helpers (_crash_schedule) importable from every test module
# without per-file sys.path boilerplate (code-review r9)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pytest_collection_modifyitems(config, items):
    """Fast default tier (VERDICT r10 #1): the suite grew to ~790 tests /
    36-86 min and the driver's verify run times out mid-suite, which turns
    a green tree into an unverifiable one. Tests marked `slow` (the
    plan-capture batteries, multiprocess crash/kill fuzzes, scale probes —
    release gates, not per-change regressions) are skipped by default and
    run under SPARK_GRAFT_SLOW=1; the default tier targets <= 20 min."""
    if os.environ.get("SPARK_GRAFT_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set SPARK_GRAFT_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # leaner for unit tests

from venice_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("venice_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "venice_root")
