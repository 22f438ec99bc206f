import pytest

from hdfs_stream_processing_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hsp-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
