"""Shared SparkSession + fixture data for the test suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lc_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from loongcollector_spark.sources.transcripts import transcripts_from_events

    return transcripts_from_events(spark, SF_DIR).cache()


def make_df(spark, rows: list[dict], schema: str):
    return spark.createDataFrame([tuple(r.values()) for r in rows], schema)


@pytest.fixture(scope="session")
def text_df_factory(spark):
    """Build a 1-column ('content') DataFrame from raw lines — the shape of
    the reference's processor unittest fixtures
    ({"events":[{"contents":{"content": <line>}}]},
    core/unittest/processor/ProcessorParseRegexNativeUnittest.cpp:170-228)."""

    def make(lines: list[str | None]):
        return spark.createDataFrame(
            [(i, line) for i, line in enumerate(lines)], "idx int, content string"
        )

    return make


def rows_as_dicts(df, order_by=("idx",)):
    return [r.asDict() for r in df.orderBy(*order_by).collect()]
