from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geostatssolvers_jl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(
        app_name="geostats-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "4096"},
    )
    yield sp


@pytest.fixture(scope="session")
def data2d_3pt(spark):
    """FIXTURES.md F2 — the canonical conditioning dataset
    (reference: test/estimation/krig.jl:25)."""
    return spark.createDataFrame(
        [(0, 25.0, 25.0, 1.0), (1, 50.0, 75.0, 0.0), (2, 75.0, 50.0, 1.0)],
        "data_id long, x double, y double, z double",
    )
