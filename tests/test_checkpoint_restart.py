"""Batch checkpoint-restart (reference src/HPAT.jl:310-328
`HPAT.restart` semantics): an iterative loop killed mid-run resumes
from its last durable snapshot and converges to the same result as an
uninterrupted run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.operators.iterative import (
    checkpointed_loop,
    checkpointed_pagerank,
    pagerank,
)


@pytest.fixture(scope="module")
def edges(spark):
    # two triangles bridged by one edge + a dangling sink
    pairs = [
        (1, 2), (2, 3), (3, 1),
        (4, 5), (5, 6), (6, 4),
        (3, 4), (6, 7),
    ]
    return spark.createDataFrame(pairs, "src long, dst long")


def _rounded(df):
    return {
        r.vertex: round(r.rank, 6)
        for r in df.select("vertex", "rank").collect()
    }


def test_resume_matches_uninterrupted(spark, edges, tmp_path):
    """Kill-and-resume: run 3 of 10 iterations (snapshot every 1), then
    'restart the driver' by calling again with the same path — the
    resumed run must pick up at iteration 3 (not 0) and finish with the
    same ranks as one uninterrupted 10-iteration run."""
    full = _rounded(
        checkpointed_pagerank(
            edges, str(tmp_path / "full"), max_iter=10, tol=0.0,
            snapshot_every=100,
        )
    )
    part_path = str(tmp_path / "partial")
    checkpointed_pagerank(
        edges, part_path, max_iter=3, tol=0.0, snapshot_every=1
    )
    # snapshots exist and the pointer names iteration 3
    ptr = spark.read.parquet(f"{part_path}/_latest").collect()
    assert max(r.next_iter for r in ptr) == 3
    resumed = _rounded(
        checkpointed_pagerank(
            edges, part_path, max_iter=10, tol=0.0, snapshot_every=1
        )
    )
    assert resumed == full


def test_convergence_snapshot_short_circuits(spark, edges, tmp_path):
    """A loop resumed AFTER convergence re-runs nothing extra: the
    pointer already sits at the converged iteration, and the returned
    state equals the stored snapshot."""
    path = str(tmp_path / "conv")
    first = _rounded(
        checkpointed_pagerank(edges, path, max_iter=50, tol=1e-2)
    )
    ptr1 = max(
        r.next_iter for r in spark.read.parquet(f"{path}/_latest").collect()
    )
    assert ptr1 < 50  # converged early, snapshot written at convergence
    again = _rounded(
        checkpointed_pagerank(edges, path, max_iter=50, tol=1e-2)
    )
    ptr2 = max(
        r.next_iter for r in spark.read.parquet(f"{path}/_latest").collect()
    )
    assert again == first
    assert ptr2 >= ptr1  # resumed at/after the stored iteration


def test_checkpointed_matches_plain_pagerank(spark, edges, tmp_path):
    """The checkpointed loop is semantically invisible: same ranks as
    the plain pagerank operator."""
    plain = {
        r.vertex: round(r.rank, 6)
        for r in pagerank(edges, max_iter=10, tol=0.0).collect()
    }
    ck = _rounded(
        checkpointed_pagerank(
            edges, str(tmp_path / "twin"), max_iter=10, tol=0.0
        )
    )
    assert ck == plain


def test_generic_loop_counter(spark, tmp_path):
    """checkpointed_loop on a trivial additive state: resume continues
    the count from the snapshot, proving start-iteration arithmetic."""
    path = str(tmp_path / "cnt")

    def step(df, i):
        return df.withColumn("n", F.col("n") + 1)

    init = spark.createDataFrame([(0,)], "n int")
    out = checkpointed_loop(init, step, path, max_iter=4, snapshot_every=2)
    assert out.collect()[0].n == 4
    # resume with a higher budget: continues from 4, not from 0
    out2 = checkpointed_loop(init, step, path, max_iter=7, snapshot_every=2)
    assert out2.collect()[0].n == 7


def test_mttf_interval_formula():
    from hpat_jl_spark.operators.iterative import mttf_snapshot_interval

    assert mttf_snapshot_interval(2.0, 9.0) == 6.0  # sqrt(2*2*9)
    assert mttf_snapshot_interval(0.0, 100.0) == 0.0


def _count_snapshots(path) -> int:
    import os

    return len([d for d in os.listdir(path) if d.startswith("iter_")])


def test_adaptive_cadence_huge_mttf_snapshots_sparsely(spark, tmp_path):
    """snapshot_every=None + huge MTTF: Young's interval dwarfs the loop
    runtime, so only the cost-probe snapshot (iteration 1) and the
    mandatory final snapshot are written."""
    path = str(tmp_path / "adaptive_sparse")
    st = spark.createDataFrame([(0,)], "n long")
    out = checkpointed_loop(
        st,
        lambda s, i: s.select((F.col("n") + 1).alias("n")),
        path,
        max_iter=6,
        snapshot_every=None,
        mttf_seconds=1e12,
    )
    assert out.first().n == 6
    assert _count_snapshots(path) == 2  # probe + final


def test_adaptive_cadence_zero_mttf_snapshots_every_iteration(spark, tmp_path):
    """MTTF → 0 collapses the interval to 0: every iteration snapshots
    (the failure-paranoid limit), and restart still resumes correctly."""
    path = str(tmp_path / "adaptive_dense")
    st = spark.createDataFrame([(0,)], "n long")
    out = checkpointed_loop(
        st,
        lambda s, i: s.select((F.col("n") + 1).alias("n")),
        path,
        max_iter=4,
        snapshot_every=None,
        mttf_seconds=0.0,
    )
    assert out.first().n == 4
    assert _count_snapshots(path) == 4
    # resume of a finished adaptive loop is a no-op returning final state
    again = checkpointed_loop(
        st,
        lambda s, i: s.select((F.col("n") + 1).alias("n")),
        path,
        max_iter=4,
        snapshot_every=None,
        mttf_seconds=0.0,
    )
    assert again.first().n == 4
