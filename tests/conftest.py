from __future__ import annotations

import pytest

from ursa_major_choir_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def raw(spark):
    from ursa_major_choir_etl_spark.sources.io import read_wide_sheet_csv

    df = read_wide_sheet_csv(spark, "tests/fixtures/raw_wide.csv")
    df.cache()
    df.count()
    return df
