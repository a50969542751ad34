import pytest

from recdb_postgresql_spark.engine import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("recdb_tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
