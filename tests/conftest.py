from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_cdc.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pyspark_cdc_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "table")


def rows_by_key(df):
    return {(r["repo"], r["path"]): r.asDict() for r in df.collect()}
