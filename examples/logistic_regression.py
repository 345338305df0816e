#!/usr/bin/env python
"""Logistic regression — the reference's flagship example
(/root/reference/examples/logistic_regression.jl: hand-written gradient
descent compiled to gemm + MPI_Allreduce per iteration; README.md:46-87
claims 'two orders of magnitude faster' than 2016-era Spark RDD code).

Here the same model is ONE pyspark.ml estimator call: the distributed
gradient work (per-partition gemm + tree aggregation) is what MLlib
already implements, with L-BFGS instead of fixed-step gradient descent.

    python examples/logistic_regression.py [n_rows] [n_features]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthesize(spark: SparkSession, n: int, d: int, seed: int = 42) -> DataFrame:
    """Separable synthetic data: label = 1 iff sum of features > d/2
    (mirrors the reference's generate_data scripts)."""
    cols = [F.rand(seed + i).alias(f"f{i}") for i in range(d)]
    df = spark.range(n).select(*cols)
    s = sum(F.col(f"f{i}") for i in range(d))
    return df.withColumn("label", (s > d / 2.0).cast("double"))


def train(df: DataFrame, d: int, max_iter: int = 20):
    from hpat_jl_spark.ml import logistic_regression

    return logistic_regression(df, [f"f{i}" for i in range(d)], "label",
                               max_iter=max_iter)


def write_training_hdf5(spark: SparkSession, path: str, n: int, d: int) -> None:
    """The reference's generate_data layout: /points as an n×d float64
    matrix, /responses as an n-vector — one classic-HDF5 file
    (sources/hdf5.write_hdf5), exactly what logistic_regression.jl
    @h5read's."""
    import numpy as np

    from hpat_jl_spark.sources.hdf5 import write_hdf5

    pdf = synthesize(spark, n, d).toPandas()
    write_hdf5(
        path,
        {
            "points": pdf[[f"f{i}" for i in range(d)]].to_numpy("<f8"),
            "responses": pdf["label"].to_numpy("<f8"),
        },
    )


def train_from_hdf5(spark: SparkSession, path: str, max_iter: int = 20):
    """The reference's flagship ENTRY pattern end-to-end: points and
    responses arrive as HDF5 datasets (capture-api.jl @h5read) and are
    read in ONE aligned distributed pass (read_hdf5_table: each task
    seeks the same row range of the matrix and the response vector, so
    the implicit HPAT row alignment costs no shuffle — the earlier
    per-dataset read + row_id join shuffled the whole matrix just to
    restore it), then fed to the estimator."""
    from hpat_jl_spark.sources.hdf5 import read_hdf5_table, scan_hdf5
    from hpat_jl_spark.ml import logistic_regression

    d = scan_hdf5(path)["points"].shape[1]
    df = read_hdf5_table(spark, path, ["points", "responses"]).withColumnRenamed(
        "responses", "label"
    )
    return logistic_regression(df, [f"points_c{i}" for i in range(d)], "label",
                               max_iter=max_iter)


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--hdf5"]
    use_hdf5 = "--hdf5" in sys.argv
    n = int(args[0]) if args else (100_000 if use_hdf5 else 1_000_000)
    d = int(args[1]) if len(args) > 1 else 10
    spark = get_spark(app_name="logreg")
    if use_hdf5:  # the reference's actual input format, end to end
        import tempfile

        path = str(pathlib.Path(tempfile.mkdtemp()) / "train.h5")
        write_training_hdf5(spark, path, n, d)
        coefs, intercept = train_from_hdf5(spark, path)
    else:
        coefs, intercept = train(synthesize(spark, n, d), d)
    print(f"trained {d}-feature model; first coefs {coefs[:3]}, b={intercept:.3f}")
    spark.stop()
