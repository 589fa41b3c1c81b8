from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402
from cost_of_living_data_etl_spark.vendor import ensure_protobuf  # noqa: E402

# Engage the vendored google.protobuf shim (no-op when the real wheel
# is installed) BEFORE any SparkSession exists, so Python workers
# inherit the PYTHONPATH entry — transformWithStateInPandas drives its
# state server over protobuf from inside the workers.
ensure_protobuf()

# Fixture root: the driver's read-only /root/testdata by default;
# override with SPARK_GRAFT_TESTDATA to run the suite on fixtures from
# tools/gen_testdata.py (CI, laptops — anywhere outside the sandbox).
import os  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_ORACLE = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="cost-of-living-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
