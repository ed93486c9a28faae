from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from project_1_greentech_logistics_data_pipeline_spark.session import get_spark

    s = get_spark("p1gl-tests", master="local[4]")
    yield s
    s.stop()
