import os
import sys

import pytest

# tests-dir helpers (_crash_schedule) importable from every test module
# without per-file sys.path boilerplate (code-review r9)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
