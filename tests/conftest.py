import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ledger_data_indexer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="sldi-tests", master="local[4]", shuffle_partitions=4,
                  extra={"spark.ui.enabled": "false",
                         "spark.driver.memory": "4g"})
    yield s
    s.stop()
