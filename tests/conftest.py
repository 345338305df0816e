"""Shared pytest fixtures: one SparkSession for the whole run at
local[4] (>1 parallelism to catch partition-boundary bugs — the
reference's `mpirun -np 2` trick, FIXTURES.md harness conventions),
plus sf-dir constants.
"""

from __future__ import annotations

import pytest

from hpat_jl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="hpat_jl_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
