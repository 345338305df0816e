"""Contract tests for bench.py's prepared-plan timing (VERDICT r06 #1).

bench.PREPARED queries are timed as build-once / execute-per-rep, which
is only honest if fn() is a PURE plan builder: no Spark jobs, no writes,
no driver-side fits during construction. These tests pin that contract
so a future rewrite that adds an eager fit to a PREPARED query fails
loudly instead of silently being under-timed.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from hpat_jl_spark import registry  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def test_prepared_is_subset_of_headline_and_registry():
    qs = registry.queries()
    assert bench.PREPARED <= set(bench.HEADLINE)
    assert bench.PREPARED <= set(qs)


@pytest.mark.parametrize("name", sorted(bench.PREPARED))
def test_prepared_builds_run_no_jobs(spark, name):
    """Every PREPARED fn must construct its DataFrame without launching
    a single Spark job (first call may resolve tables — warm that up —
    the contract is on the steady-state build the bench reps rely on).
    """
    qs = registry.queries()
    fn = qs[name]
    fn(spark, SF_SMOKE)  # warm: table resolution, codegen caches
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    fn(spark, SF_SMOKE)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, (
        f"{name} launched {sorted(after - before)} Spark job(s) during "
        "plan construction — remove it from bench.PREPARED or make the "
        "builder lazy"
    )
