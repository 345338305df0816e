"""TWO_D partitioning parity: the reference's 2-D block-cyclic matrix
path (reference test/2d_test.jl roundtrip; ScaLAPACK pdgemm, reference
src/cgen-hpat-pattern-match.jl:1559-1662) maps to Spark's distributed
BlockMatrix — block-partitioned storage and a distributed multiply whose
result must equal the driver-side numpy product exactly in structure and
to float tolerance in values.
"""

from __future__ import annotations

import numpy as np


def test_blockmatrix_multiply_matches_numpy(spark):
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    rng = np.random.default_rng(3)
    A = rng.normal(size=(40, 12))
    B = rng.normal(size=(12, 7))

    rows_a = spark.sparkContext.parallelize(
        [IndexedRow(i, A[i].tolist()) for i in range(A.shape[0])], 4
    )
    rows_b = spark.sparkContext.parallelize(
        [IndexedRow(i, B[i].tolist()) for i in range(B.shape[0])], 2
    )
    # block-partitioned (the TWO_D layout): 16×4 blocks for A, 4×4 for B
    bm_a = IndexedRowMatrix(rows_a).toBlockMatrix(16, 4)
    bm_b = IndexedRowMatrix(rows_b).toBlockMatrix(4, 4)
    prod = bm_a.multiply(bm_b)  # distributed block gemm
    got = prod.toLocalMatrix().toArray()
    want = A @ B
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-9


def test_blockmatrix_roundtrip_preserves_values(spark):
    """The reference's 2d_test is a block-cyclic read→write roundtrip;
    here: dense → block-partitioned → dense must be lossless."""
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    rng = np.random.default_rng(5)
    M = rng.normal(size=(23, 9))  # deliberately not a multiple of block size
    rows = spark.sparkContext.parallelize(
        [IndexedRow(i, M[i].tolist()) for i in range(M.shape[0])], 3
    )
    bm = IndexedRowMatrix(rows).toBlockMatrix(8, 4)
    assert bm.numRows() == 23 and bm.numCols() == 9
    back = bm.toLocalMatrix().toArray()
    assert np.array_equal(back, M)
