import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
# python workers of the Python DataSource must be able to import the package
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


@pytest.fixture(scope="session")
def spark():
    from hls_payer_mrf_sparkstreaming_spark.session import get_spark

    spark = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def mrf_file(tmp_path_factory):
    """Session-scoped synthetic MRF fixture file."""
    from hls_payer_mrf_sparkstreaming_spark.sources.synth import write_mrf_file

    p = str(tmp_path_factory.mktemp("mrf") / "synthetic_mrf.json")
    write_mrf_file(p, n_in_network=120, n_provider_refs=25, seed=42)
    return p
