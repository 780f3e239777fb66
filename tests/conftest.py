import pytest

from aqueduct_core_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="aqueduct-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/aq-warehouse"},
    )
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "transcripts")
