"""Incremental-aggregate merge semantics (plans/relational_core.
incremental_daily_counts): the sf0.01 sweep hash-checks merge ==
one-pass against DuckDB; here the algebra is pinned on explicit rows,
including the trap the query's derivation avoids (merging averages
directly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark import registry
from hpat_jl_spark.registry import REGISTRY
from tests.conftest import SF_SMOKE

registry.load_all_plans()


def _snap(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )


def test_merge_equals_one_pass_on_split(spark):
    """merge(agg(A), agg(B)) == agg(A ∪ B) for every 2-way split."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 8.0), ("b", 16.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    want = {(r.k): (r.n, r.s) for r in _snap(df).collect()}
    for cut in range(len(rows) + 1):
        old = spark.createDataFrame(rows[:cut] or [], "k string, v double")
        new = spark.createDataFrame(rows[cut:] or [], "k string, v double")
        merged = (
            _snap(old)
            .unionByName(_snap(new))
            .groupBy("k")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        )
        got = {(r.k): (r.n, r.s) for r in merged.collect()}
        assert got == want, f"cut={cut}"


def test_naive_avg_merge_is_wrong_but_derived_is_right(spark):
    """The documented trap: avg of per-era avgs ≠ global avg under
    unequal era sizes; deriving avg from merged sum/count is exact."""
    old = spark.createDataFrame([("a", 1.0)], "k string, v double")
    new = spark.createDataFrame(
        [("a", 10.0), ("a", 10.0), ("a", 10.0)], "k string, v double"
    )
    naive = (old.groupBy("k").agg(F.avg("v").alias("a"))
             .unionByName(new.groupBy("k").agg(F.avg("v").alias("a")))
             .groupBy("k").agg(F.avg("a").alias("a")))
    [r] = naive.collect()
    assert abs(r.a - 5.5) < 1e-9  # (1 + 10)/2 — wrong
    merged = (
        _snap(old).unionByName(_snap(new))
        .groupBy("k")
        .agg((F.sum("s") / F.sum("n")).alias("a"))
    )
    [m] = merged.collect()
    assert abs(m.a - 31.0 / 4) < 1e-9  # true global mean


def test_incremental_query_empty_delta_is_noop(spark):
    """A split date beyond the data makes the delta empty; the merge
    must still equal the plain aggregate (fixture invariant run)."""
    out = REGISTRY["incremental_daily_counts"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_events > 0 for r in rows)
