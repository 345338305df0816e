"""SparkSession bootstrap.

The reference (HPAT.jl) statically compiled every program to MPI C++ with
a fixed rank count (src/HPAT.jl:232-244 pass pipeline). Here a single
session factory pins the configs that matter at the 100 TB design point:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for any Python exchange, and shuffle-partition counts sized by the
caller rather than Spark's legacy default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hpat_jl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for analytic workloads.

    On a real cluster the same configs apply; only ``master`` and memory
    sizing change. AQE makes the shuffle-partition setting a ceiling, not
    a fixed fan-out: at 100 TB you set it high (e.g. 2000+) and let
    coalescing shrink small stages.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Silence pyspark's own worker-side pandas FutureWarning (VERDICT
    # r05 #7): serializers.py concats Arrow batches per partition and
    # trips pandas' empty-or-all-NA concat deprecation once per task —
    # hundreds of identical lines burying every sweep's ok/FAIL output.
    # It fires in the PYTHON WORKER processes, so a driver-side
    # warnings.filterwarnings can't reach it; workers inherit the
    # driver env in local mode (and executorEnv on a cluster), so the
    # filter rides in via PYTHONWARNINGS, scoped to that one module.
    _pyspark_noise = "ignore::FutureWarning:pyspark.sql.pandas.serializers"
    warn_opts = [w for w in os.environ.get("PYTHONWARNINGS", "").split(",") if w]
    if _pyspark_noise not in warn_opts:
        os.environ["PYTHONWARNINGS"] = ",".join(warn_opts + [_pyspark_noise])
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime re-plan (coalesce small shuffle partitions, convert
        # to broadcast join when a side turns out small, split skew).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # parallelismFirst stays at Spark's default (true). Size-first
        # coalescing (false) was measured in r5: it shaves ~5-10% off
        # scan-bound TPC-H queries at sf0.1 by collapsing KB-sized
        # shuffle partitions, but it STRANGLES compute-dense/byte-light
        # stages — triangle_count's per-order pair explode coalesced to
        # ~1 partition and went from 2s to 48s at sf0.01. Byte size is
        # a bad proxy for CPU cost, which is exactly why Spark defaults
        # to defending parallelism.
        # No rack/node locality to wait for on local[...] or
        # cloud-storage clusters; the 3s default delay-schedules real
        # work (r5 measurement: ~5-10% on short queries).
        .config("spark.locality.wait", "0")
        # Arrow for every Python<->JVM exchange (pandas_udf, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Timestamps in fixtures are ns-precision; keep them lossless.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
