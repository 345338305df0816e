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


def sized_shuffle_partitions(
    sf_dir: str,
    target_bytes: int = 2 << 20,
    floor: int = 8,
    per_core_cap: int = 4,
) -> int:
    """Shuffle-partition ceiling sized by the corpus, not a constant.

    This is the documented design rule applied (this module's docstring:
    "at 100 TB you set it high and let coalescing shrink") — the inverse
    holds too: a 15 MB corpus does not want 32-task reduce stages. Every
    shuffle stage then pays ~2-5 ms/task of pure scheduling, which is
    exactly the fixed overhead VERDICT r06 #1 measured dominating the
    sub-second queries (q5 steady state: 0.32 s of task time inside
    0.99 s of wall). Sizing: one partition per ~2 MB of input parquet,
    floored at 8 (keeps multi-core reduce for compute-dense/byte-light
    stages — the r5 parallelismFirst trap showed byte size alone is a
    bad proxy for CPU cost), capped at 4× the worker threads (more
    ceiling than that only helps when AQE needs headroom to split skew,
    and the skew-join splitter works under the cap too). At 100 TB the
    same formula saturates the cap — i.e. the classic 2-4×-total-cores
    setting — so nothing here is bench-special. Measured at sf0.1:
    headline total 39.1 s → 33.2 s with plans unchanged (AQE stays on;
    only the reduce fan-out shrinks).
    """
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                if f.endswith(".parquet"):
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
    except OSError:
        pass
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return max(floor, min(total // target_bytes, per_core_cap * cpus))


# Per-path (files, sizes, total_row_groups) listing memo. Fixtures are
# immutable per directory (the load_table cache's assumption); conf-
# dependent packing is recomputed per call so a probe that re-tunes
# maxPartitionBytes (scaling_probe stages do) still gets fresh counts.
_SCAN_LISTING_CACHE: dict[str, tuple[list[int], int]] = {}


def _parse_jvm_bytes(v: str | int) -> int:
    """Parse a JVM byte-size conf string ('128MB', '4194304b', '1g')."""
    if isinstance(v, int):
        return v
    s = v.strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            mult = m
            s = s[: -len(suffix)]
            break
    return int(float(s) * mult)


def scan_split_count(spark: SparkSession, path: str) -> int:
    """Effective scan parallelism for a parquet file-or-directory,
    computed from the file listing, the session's split confs, and the
    parquet footers — with NO ``.rdd`` call (ADVICE r12:
    ``df.rdd.getNumPartitions()`` at plan-construction time forces
    physical planning; if an exchange is ever composed upstream, AQE's
    final-plan materialization would run jobs during build and break
    the prepared-query zero-jobs bench contract).

    Two components, take the min:

    - Spark's own split packing — ``FilePartition.maxSplitBytes``
      (``min(maxPartitionBytes, max(openCostInBytes, totalBytes/
      minPartitionNum))``) then the greedy size-descending bin-pack of
      ``getFilePartitions`` — the count ``.rdd.getNumPartitions()``
      reports on a bare scan (validated against it in
      tests/test_session.py across the fixtures and conf settings);
    - the total parquet ROW-GROUP count (ADVICE r12 / the r7 trap:
      byte-range splits only yield rows where a row group STARTS, so a
      large single-row-group file reports many partitions while only
      one task ever yields rows — the reported count OVERSTATES
      effective parallelism exactly where the starved-scan pin most
      needs to fire).

    ``min(packed, row_groups)`` is the number of scan tasks that can
    actually produce rows."""
    real = os.path.realpath(path)
    cached = _SCAN_LISTING_CACHE.get(real)
    if cached is None:
        files: list[str] = []
        if os.path.isdir(real):
            for root, _dirs, fs in os.walk(real):
                files.extend(
                    os.path.join(root, f) for f in fs if f.endswith(".parquet")
                )
        else:
            files = [real]
        sizes = [os.path.getsize(f) for f in files]
        import pyarrow.parquet as pq

        row_groups = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
        cached = (sizes, row_groups)
        _SCAN_LISTING_CACHE[real] = cached
    sizes, row_groups = cached
    if not sizes:
        return 1
    max_part = _parse_jvm_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    open_cost = _parse_jvm_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4MB")
    )
    min_parts = spark.conf.get("spark.sql.files.minPartitionNum", None)
    if min_parts is None:
        min_parts = spark.conf.get(
            "spark.sql.leafNodeDefaultParallelism", None
        )
    min_parts = (
        int(min_parts)
        if min_parts is not None
        else spark.sparkContext.defaultParallelism
    )
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_part, max(open_cost, total // max(min_parts, 1)))
    # byte-range splits of each file, then greedy size-desc bin-pack
    splits: list[int] = []
    for s in sizes:
        off = 0
        while off < s:
            splits.append(min(max_split, s - off))
            off += max_split
    splits.sort(reverse=True)
    n_partitions, current = 0, 0
    for s in splits:
        if current + s > max_split:
            n_partitions += 1
            current = 0
        current += s + open_cost
    if current > 0:
        n_partitions += 1
    return max(1, min(n_partitions, row_groups))


def starved_scan_pin_width(
    scan_parts: int, default_parallelism: int, sized_parts: int
) -> int | None:
    """Width for a split-starvation repartition of a raw-text stream,
    or None when the scan already feeds enough tasks. Pin only when
    the scan yields under a quarter of the cores: a LIGHT-compute
    stage downstream of a split-RICH scan loses more to the raw-text
    exchange than it gains in parallelism (late-r12, interleaved
    min-of-3 at the ×10 staged tier: duplicate_span_report 2.27 s
    pinned vs 0.75 s unpinned; benchmark_decontaminate 3.02 vs
    2.48 s), while the single-row-group bench fixtures report 1 split
    and starve every core. Heavy encodes (~100 CPU-bytes/byte — the
    BPE projections) keep unconditional pins: the exchange is measured
    noise there at every tier. At real scale the scan is split-rich
    and this never fires — it is a small-fixture patch. Callers pass
    ``scan_parts`` from scan_split_count above (r13): its row-group
    cap means a large single-row-group file — which reports many
    byte-range partitions while only one task yields rows, the r7
    trap — is correctly counted as 1 and gets its pin."""
    if scan_parts * 4 >= default_parallelism:
        return None
    return max(default_parallelism, sized_parts)


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
        # NOT set: spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
        # (evaluated r9, rejected). It would let AQE convert SMJ →
        # shuffled-hash join from measured partition bytes, but Spark
        # only applies the rule when the threshold ≥
        # advisoryPartitionSizeInBytes (64 MB default) — and a 64 MB
        # build × 32 concurrent tasks is exactly the ~2 GB unspillable
        # residency that OOM'd q01_copurchase's static SHUFFLE_HASH
        # hint at the ×100 tier (memory probe, 4g budget). Hash builds
        # of corpus/parallelism bytes are anti-scale at fixed executor
        # memory; sort-merge spills, so SMJ stays the default.
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
        # Allow subset-key co-partitioning for joins (r11, q21): a join
        # on (orderkey, suppkey) whose BOTH children already carry
        # HashPartitioning(orderkey) is co-located — rows with equal
        # orderkey meet regardless of suppkey — but Spark 4's default
        # (true) refuses the subset and re-shuffles both sides on the
        # full key set, defeating any pinned-exchange design that
        # shares one partitioning across an aggregate, a window, and a
        # join (the q01/hll exchange-reuse treatment). false restores
        # the subset rule. Correctness-neutral (the driver's vanilla
        # session still computes identical results through extra
        # exchanges); the skew risk the default guards against is
        # covered by AQE skew-join splitting above.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
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
