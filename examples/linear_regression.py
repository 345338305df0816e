#!/usr/bin/env python
"""Linear regression — reference examples/linear_regression.jl (DAAL
QR-based distributed OLS kernel). Here: pyspark.ml LinearRegression
('normal' closed-form solver for small feature counts).

    python examples/linear_regression.py [n_rows]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, n: int, seed: int = 42):
    from hpat_jl_spark.ml import linear_regression

    df = spark.range(n).select(
        F.rand(seed).alias("x1"), F.rand(seed + 1).alias("x2")
    )
    noiseless = df.withColumn("y", 3.0 * F.col("x1") - 2.0 * F.col("x2") + 1.0)
    return linear_regression(noiseless, ["x1", "x2"], "y")


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="linreg")
    coefs, intercept = run(spark, n)
    print(f"coefs={['%.4f' % c for c in coefs]} intercept={intercept:.4f}")
    spark.stop()
