from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake2anomali_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def hyp_settings():
    """Shared hypothesis settings for every model/property test — ONE
    soak knob (`SPARK_GRAFT_HYP_EXAMPLES=25 pytest tests/*model*`)
    instead of six copy-pasted blocks."""
    from hypothesis import HealthCheck

    return dict(
        max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "5")),
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
