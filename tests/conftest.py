from __future__ import annotations

import pytest
from hypothesis import settings

settings.register_profile("fast", max_examples=15, deadline=None)
settings.load_profile("fast")


@pytest.fixture(scope="session")
def spark():
    from locus_spark.session import get_spark

    s = get_spark(app_name="locus_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
