from __future__ import annotations

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark
    spark.stop()
