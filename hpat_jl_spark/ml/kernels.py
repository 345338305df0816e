"""DAAL-kernel equivalents via pyspark.ml.

Reference surface (SURVEY §2.9): `Kmeans(points, k[, iters])`,
`LinearRegression(points, responses)`, `NaiveBayes(points, responses,
nclasses)` — recognized calls swapped for Intel DAAL distributed
implementations (reference src/api.jl:6,32-55 naive fallbacks;
src/cgen-hpat-pattern-match-daal.jl:28-470 the DAAL C++). The reference
stored matrices column-major, samples along the distributed dimension,
and assembled features with `transpose(typed_hcat(...))` (reference
test/tables_transpose_hcat.jl) before rebalancing chunks for DAAL
(src/distributed-pass.jl:1280-1334 __hpat_arr_rebalance).

Spark equivalents: a features DataFrame (one row per sample — the same
distribution HPAT's last-dimension partitioning produced), assembled
with VectorAssembler (no rebalance needed: Spark tasks don't require
equal chunks), estimated with pyspark.ml's distributed implementations.
All estimators take an explicit seed → deterministic on fixed input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(
    df: DataFrame, cols: list[str], out: str = "features"
) -> DataFrame:
    """`transpose(typed_hcat(cols...))` → ml vector column.

    Reference: columns hcat'd into a samples×features matrix then
    transposed for DAAL's layout (src/domain-pass.jl:590-617 fused
    kernel). Spark: VectorAssembler; layout is irrelevant — the
    DataFrame row IS the sample."""
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=cols, outputCol=out)
    return asm.transform(df)


def kmeans(
    df: DataFrame,
    feature_cols: list[str],
    k: int,
    max_iter: int = 20,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """KMeans (reference src/cgen-hpat-pattern-match-daal.jl:28-217:
    DAAL distributed kmeans with master-worker MPI rounds → pyspark.ml
    KMeans, same Lloyd's-iteration semantics, k-means|| init).

    Returns (input + 'cluster' column, cluster centers)."""
    from pyspark.ml.clustering import KMeans as MLKMeans

    feats = assemble_features(df, feature_cols)
    model = MLKMeans(
        k=k, maxIter=max_iter, seed=seed, featuresCol="features",
        predictionCol="cluster",
    ).fit(feats)
    out = model.transform(feats).drop("features")
    return out, [list(map(float, c)) for c in model.clusterCenters()]


def linear_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    reg_param: float = 0.0,
) -> tuple[list[float], float]:
    """LinearRegression (reference src/cgen-hpat-pattern-match-daal.jl:
    224-341: DAAL QR-based distributed OLS). Returns (coefficients,
    intercept)."""
    from pyspark.ml.regression import LinearRegression as MLLinReg

    feats = assemble_features(df, feature_cols)
    model = MLLinReg(
        featuresCol="features", labelCol=label_col, regParam=reg_param
    ).fit(feats)
    return [float(c) for c in model.coefficients], float(model.intercept)


def naive_bayes(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    smoothing: float = 1.0,
) -> DataFrame:
    """Multinomial NaiveBayes (reference src/cgen-hpat-pattern-match-
    daal.jl:347-470). Features must be non-negative (multinomial
    counts). Returns input + 'prediction'."""
    from pyspark.ml.classification import NaiveBayes as MLNB

    feats = assemble_features(df, feature_cols)
    model = MLNB(
        featuresCol="features", labelCol=label_col, smoothing=smoothing,
        modelType="multinomial",
    ).fit(feats)
    return model.transform(feats).drop("features", "rawPrediction", "probability")


def logistic_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 100,
) -> tuple[list[float], float]:
    """Logistic regression — the reference's flagship hand-written
    example (README.md:46-87, examples/logistic_regression.jl: gradient
    descent with gemm + allreduce per iteration). pyspark.ml uses
    L-BFGS over the same distributed gradient; returns (coefficients,
    intercept)."""
    from pyspark.ml.classification import LogisticRegression as MLLogReg

    feats = assemble_features(df, feature_cols)
    model = MLLogReg(
        featuresCol="features", labelCol=label_col, maxIter=max_iter
    ).fit(feats)
    return [float(c) for c in model.coefficients], float(model.intercept)
