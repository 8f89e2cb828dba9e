import pytest

from reactivedb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("reactivedb_spark_tests", cpus=4)


@pytest.fixture()
def workspace(tmp_path):
    return str(tmp_path / "ws")


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
