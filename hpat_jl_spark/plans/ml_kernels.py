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


@register("ml_logreg_purchase", oracle=None, tags=("ml",))
def ml_logreg_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression — the reference's flagship hand-written
    example (reference README.md:46-87, examples/logistic_regression.jl:
    per-iteration gemm + allreduce) as a registered query: P(purchase)
    from the event's value over the events table, fit with pyspark.ml
    L-BFGS (distributed gradient = the allreduce). Rows-only: no SQL
    twin for the iterative fit; linear-separation recovery is pinned by
    tests/test_ml.py::test_logistic_regression_separates. Output is the
    1-row (coef, intercept) rounded to 3dp — deterministic on fixed
    input/partitioning (verified by scripts/determinism_sweep.py)."""
    from hpat_jl_spark.ml import logistic_regression
    from hpat_jl_spark.tables import load_table as _lt

    ev = _lt(spark, "events", sf_dir)
    labeled = ev.select(
        F.col("value").alias("x"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias(
            "label"
        ),
    )
    coefs, intercept = logistic_regression(labeled, ["x"], "label")
    return spark.createDataFrame(
        [(round(coefs[0], 3), round(intercept, 3))],
        "coef_value double, intercept double",
    )


@register("ml_naive_bayes_lang", oracle=None, tags=("ml",))
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NaiveBayes (reference src/cgen-hpat-pattern-match-
    daal.jl:347-470, the third DAAL kernel) as a registered query:
    predict a document's lang from non-negative token-count features
    (total tokens + counts of three common words). The NB fit is
    closed-form count aggregation — fully deterministic. Rows-only
    (no SQL twin); planted-class recovery is pinned by
    tests/test_ml.py::test_naive_bayes_separates_classes. Output: the
    (lang, predicted_label, n) confusion counts.

    Scale shape: feature extraction is one narrow scan (codegen'd
    split/filter, no Python); the fit aggregates per-class counts —
    one shuffle keyed on label."""
    from pyspark.sql import Window

    from hpat_jl_spark.ml import naive_bayes

    docs = load_table(spark, "documents", sf_dir)

    def wc(word: str):
        return F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t == F.lit(word))
        ).cast("double")

    # dense numeric class ids from the (tiny, bounded) lang dimension
    langs = docs.select("lang").distinct()
    lang_ids = langs.withColumn(
        "label",
        (F.row_number().over(Window.orderBy("lang")) - 1).cast("double"),
    )
    feats = (
        docs.join(lang_ids, "lang")
        .select(
            "lang",
            "label",
            F.size(F.split(F.col("text"), " ")).cast("double").alias("n_tok"),
            wc("the").alias("w_the"),
            wc("a").alias("w_a"),
            wc("value").alias("w_value"),
        )
    )
    pred = naive_bayes(feats, ["n_tok", "w_the", "w_a", "w_value"], "label")
    return (
        pred.groupBy("lang", F.col("prediction").alias("predicted_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
