from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluent_bit_spark import fixtures as fx  # noqa: E402
from fluent_bit_spark.session import get_spark  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".data")
UNIT_ROWS = 5_000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fbs-tests", master="local[4]",
                  shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_paths():
    return fx.ensure_fixture_dir(DATA_DIR, n_rows=UNIT_ROWS)


@pytest.fixture(scope="session")
def tokens_df(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["tokens"])
