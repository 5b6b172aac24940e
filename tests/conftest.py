import pytest

from wrangler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wrangler_spark_tests", cpus=4)
    yield s
