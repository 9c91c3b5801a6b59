import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from punt_spark.fixtures import write_fixtures  # noqa: E402
from punt_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="punt_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(d), n=3000, seed=42, year=2017)
    return str(d)


@pytest.fixture(scope="session")
def transcripts(spark, fixtures_dir):
    return spark.read.parquet(os.path.join(fixtures_dir, "transcripts.parquet"))
