#!/usr/bin/env python
"""Black-Scholes option pricing — reference examples/blackscholes.jl
(element-wise math over price/strike/time columns, fused by the
reference's parfor pipeline; here one codegen'd projection).

The reference used erf(); Spark has no erf built-in, so the CDF uses
the Abramowitz-Stegun 7.1.26 polynomial (|err| < 1.5e-7) composed from
exp/abs — still pure Column math, no Python.

    python examples/blackscholes.py [n_options]
"""

from __future__ import annotations

import sys

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _std_normal_cdf(x: Column) -> Column:
    """Φ(x) via A&S 7.1.26 erf approximation (max abs error 1.5e-7)."""
    t = 1.0 / (1.0 + 0.3275911 * F.abs(x) / F.sqrt(F.lit(2.0)))
    poly = (
        t
        * (
            0.254829592
            + t
            * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
        )
    )
    erf_abs = 1.0 - poly * F.exp(-(x * x) / 2.0)
    erf_signed = F.when(x >= 0, erf_abs).otherwise(-erf_abs)
    return 0.5 * (1.0 + erf_signed)


def price_options(
    df: DataFrame,
    rate: float = 0.02,
    volatility: float = 0.30,
) -> DataFrame:
    """Adds call/put price columns; expects columns price (spot),
    strike, t (years)."""
    s, k, t = F.col("price"), F.col("strike"), F.col("t")
    sqrt_t = F.sqrt(t)
    d1 = (F.log(s / k) + (rate + volatility**2 / 2.0) * t) / (volatility * sqrt_t)
    d2 = d1 - volatility * sqrt_t
    call = s * _std_normal_cdf(d1) - k * F.exp(-rate * t) * _std_normal_cdf(d2)
    put = call - s + k * F.exp(-rate * t)  # put-call parity
    return df.withColumn("call", call).withColumn("put", put)


def synthesize(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.range(n).select(
        (F.rand(seed) * 100 + 50).alias("price"),
        (F.rand(seed + 1) * 100 + 50).alias("strike"),
        (F.rand(seed + 2) * 2 + 0.1).alias("t"),
    )


if __name__ == "__main__":
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from hpat_jl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="blackscholes")
    out = price_options(synthesize(spark, n))
    print(out.agg(F.round(F.avg("call"), 4), F.round(F.avg("put"), 4)).collect()[0])
    spark.stop()
