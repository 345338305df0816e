#!/usr/bin/env python
"""KMeans — reference examples/kmeans.jl (hand-written Lloyd iteration
with distance comprehensions + indmin; DAAL kernel in the compiled
path). Here: pyspark.ml KMeans over a features DataFrame.

    python examples/kmeans.py [n_points] [k]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, n: int, k: int, seed: int = 42):
    from hpat_jl_spark.ml import kmeans

    pts = spark.range(n).select(
        (F.rand(seed) * 10 + (F.col("id") % k) * 20).alias("x"),
        (F.rand(seed + 1) * 10).alias("y"),
    )
    assigned, centers = kmeans(pts, ["x", "y"], k=k, seed=seed)
    return assigned.groupBy("cluster").count(), centers


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="kmeans")
    sizes, centers = run(spark, n, k)
    sizes.show()
    print("centers:", [[round(c, 2) for c in ctr] for ctr in centers])
    spark.stop()
