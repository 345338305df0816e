"""ML kernels — the reference's Intel DAAL-backed named kernels
(Kmeans / LinearRegression / NaiveBayes, reference src/api.jl:6,
src/cgen-hpat-pattern-match-daal.jl) re-expressed over pyspark.ml,
plus the feature-assembly step (transpose_hcat → vector column).
"""

from hpat_jl_spark.ml.kernels import (  # noqa: F401
    assemble_features,
    kmeans,
    linear_regression,
    logistic_regression,
    naive_bayes,
)
