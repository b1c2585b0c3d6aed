import pytest

from conflation_spark.datagen import ensure_fixture
from conflation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("conflation_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixture_dir():
    return ensure_fixture("sf0.001")
