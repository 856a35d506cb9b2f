from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from udacity_data_engineering_capstone_project_spark import get_spark

    import tempfile

    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


# hypothesis runs the test body many times per test function; a
# function-scoped fixture interacts badly with @given, so expose the
# session fixture under a second name for property tests.
@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
