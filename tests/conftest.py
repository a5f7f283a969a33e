import os
import shutil
import tempfile

import pytest

from e_commerce_batch_etl_pipeline_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_clean():
    d = tempfile.mkdtemp(prefix="cdc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
