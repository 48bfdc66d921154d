from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from logistream_data_pipeline_aws_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("logistream-tests", master="local[4]", shuffle_partitions=4)
    yield s
