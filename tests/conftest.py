import pytest

from proceso_de_etl_spark import cachereg
from proceso_de_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus="8")
    yield spark
    # release memoized frames at session end so test invocations don't
    # leave pinned storage behind (r8 advisor: release_all was wired
    # only into bench.py)
    cachereg.release_all()
