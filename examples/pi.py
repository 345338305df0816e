#!/usr/bin/env python
"""Monte Carlo Pi — the reference's README benchmark
(/root/reference/README.md:88-105: 10M-1B points, '>1000x faster than
Spark' vs the 2016 RDD pi.py). The idiomatic-DataFrame form below is a
single codegen'd scan over spark.range: no Python per point, no RDD
closures — the comparison the reference benchmarked against no longer
exists in well-written Spark.

    python examples/pi.py [n_points]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def estimate_pi(spark: SparkSession, n: int, seed: int = 42) -> float:
    """4 * P(x²+y² < 1) over n uniform points — one range scan, one
    conditional count, all in whole-stage codegen."""
    pts = spark.range(n).select(
        (F.rand(seed) * 2 - 1).alias("x"), (F.rand(seed + 1) * 2 - 1).alias("y")
    )
    inside = pts.filter(F.col("x") ** 2 + F.col("y") ** 2 < 1.0).count()
    return 4.0 * inside / n


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="pi")
    print(f"pi({n} points) ≈ {estimate_pi(spark, n)}")
    spark.stop()
