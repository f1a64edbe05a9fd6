import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="minerva_etl_spark_tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()
