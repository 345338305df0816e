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


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="logreg")
    coefs, intercept = train(synthesize(spark, n, d), d)
    print(f"trained {d}-feature model; first coefs {coefs[:3]}, b={intercept:.3f}")
    spark.stop()
