import pytest

from codd_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="codd-spark-tests",
        cpus="4",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    yield s


@pytest.fixture()
def db(spark):
    from codd_spark.database import Database

    return Database(spark)
