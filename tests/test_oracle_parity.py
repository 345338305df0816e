"""The local twin of the driver's correctness gate: every registered
query with an oracle must match DuckDB at sf0.001 (fast; the driver
re-checks at sf0.01). Rows-only queries must at least execute and
return a stable schema.
"""

from __future__ import annotations

import pytest

from hpat_jl_spark import registry
from hpat_jl_spark.testing import check_query

registry.load_all_plans()
ALL = sorted(registry.REGISTRY)
WITH_ORACLE = [n for n in ALL if registry.REGISTRY[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if registry.REGISTRY[n].oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.REGISTRY[name].fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema
