import pytest

from cloud_ocr_summarizer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small core count keeps test startup cheap; semantics are
    # partitioning-independent (asserted by the property tests).
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s
