import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from streaming_algorithms_spark.sources.session import get_spark

    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def webpages(spark):
    """Small deterministic webpages table, cached for the test session."""
    from streaming_algorithms_spark.sources.webpages import generate_webpages

    df = generate_webpages(spark, 12_000, n_hosts=200, seed=42, partitions=8).cache()
    df.count()
    return df


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
