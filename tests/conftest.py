import pytest

from master_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="mps_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
