"""ML-kernel query plans (reference §2.9 named kernels). Single-feature
OLS is oracle-checked against DuckDB's regr_slope/regr_intercept
(pyspark.ml's 'normal' solver is closed-form, so they agree to fp
noise); kmeans registers rows-only (iterative, seed-dependent — golden
semantics pinned in tests/test_ml.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table


@register(
    "ml_linreg_price",
    oracle="""
SELECT round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept
FROM lineitem
""",
    tags=("ml",),
)
def ml_linreg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of extendedprice on quantity (reference LinearRegression
    kernel, src/cgen-hpat-pattern-match-daal.jl:224-341) — closed-form
    'normal' solver matches the SQL regression aggregates exactly."""
    from hpat_jl_spark.ml import linear_regression

    li = load_table(spark, "lineitem", sf_dir)
    coefs, intercept = linear_regression(
        li.select(
            F.col("l_quantity").alias("x"),
            F.col("l_extendedprice").alias("y"),
        ),
        ["x"],
        "y",
    )
    return spark.createDataFrame(
        [(round(coefs[0], 3), round(intercept, 3))], "slope double, intercept double"
    )


@register("ml_kmeans_clusters", oracle=None, tags=("ml",))
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans over lineitem numerics (reference Kmeans kernel →
    pyspark.ml). Rows-only: k rows out; cluster recovery semantics are
    pinned by tests/test_ml.py on planted clusters."""
    from hpat_jl_spark.ml import kmeans

    li = load_table(spark, "lineitem", sf_dir)
    assigned, _ = kmeans(
        li.select("l_quantity", "l_discount", "l_tax"),
        ["l_quantity", "l_discount", "l_tax"],
        k=4,
        seed=42,
    )
    return assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))


@register("multimodal_features", oracle=None, tags=("multimodal",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction over documents (fabricated
    payloads; real Spark plumbing — mapInPandas over Arrow batches).
    Rows-only: crc32/entropy kernels have no SQL twin; exact values are
    pinned by tests/test_multimodal.py."""
    from hpat_jl_spark.functions.multimodal import (
        attach_fake_payload,
        extract_features,
    )

    docs = load_table(spark, "documents", sf_dir)
    return extract_features(attach_fake_payload(docs))
