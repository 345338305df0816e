"""Ordered-column operators: stencil, cumsum, ranking, top-k.

The reference implements a 3-point stencil with MPI halo exchange
(reference src/distributed-pass.jl:882-1001) and a distributed prefix sum
via MPI_Exscan (reference src/cgen-hpat-pattern-match.jl:433-459). Both
rely on implicit file row order. DataFrames are unordered, so every
operator here takes an explicit ``order_by`` column — the semantic the
reference left implicit (SURVEY.md §7 "make ordering a parameter").

Scale note: a global ``Window.orderBy`` without ``partitionBy`` funnels
all rows through one task — correct but single-node. Each function
documents the partitioned form to use at 100 TB (a partition key, or the
chunked two-pass prefix-sum below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumsum(
    t: DataFrame,
    value: str,
    order_by: str,
    out: str = "cumsum",
    partition_by: str | None = None,
) -> DataFrame:
    """Distributed prefix sum of ``value`` in ``order_by`` order.

    Reference: local sum → MPI_Exscan → local prefix add
    (src/cgen-hpat-pattern-match.jl:433-459). Spark: running-sum window.
    With ``partition_by`` the scan is per-group and fully parallel; the
    global form serializes and should be replaced by
    :func:`cumsum_chunked` beyond ~10^8 rows.
    """
    w = (
        Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    ).orderBy(order_by).rowsBetween(Window.unboundedPreceding, 0)
    return t.withColumn(out, F.sum(value).over(w))


def cumsum_chunked(t: DataFrame, value: str, order_by: str, out: str = "cumsum",
                   num_chunks: int = 1024) -> DataFrame:
    """Scale path for a GLOBAL prefix sum: the reference's exact
    algorithm (local prefix per chunk → exclusive scan of the tiny
    per-chunk sums → local offset add; MPI_Exscan in the reference,
    src/cgen-hpat-pattern-match.jl:433-459), expressed so NO single
    task ever sees all rows.

    Chunking = repartitionByRange on the ordering column: the range
    sampler picks boundaries from a sample, and RangePartitioner
    assigns partition ids in ascending key order, so
    spark_partition_id IS the chunk index. No task sees more rows than
    a chunk — bounded by the largest run of IDENTICAL order keys (ties
    can't split across ranges; salt the ordering column if one key
    dominates). The only global object is the num_chunks-row offset
    table (broadcast).

    The tiled frame is persisted: chunk membership comes from a
    SAMPLE-seeded shuffle, and the local-prefix and chunk-total
    branches must observe the SAME assignment — without persistence
    that agreement silently depends on physical-plan exchange reuse.
    """
    from pyspark import StorageLevel

    tiled = (
        t.repartitionByRange(num_chunks, F.col(order_by))
        .withColumn("__chunk", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w_in = Window.partitionBy("__chunk").orderBy(order_by).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = tiled.withColumn("__local_cum", F.sum(value).over(w_in))
    chunk_sums = tiled.groupBy("__chunk").agg(
        F.sum(value).alias("__chunk_sum"),
        F.count(value).alias("__chunk_cnt"),
    )
    w_chunks = Window.orderBy("__chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = chunk_sums.select(
        "__chunk",
        F.coalesce(F.sum("__chunk_sum").over(w_chunks), F.lit(0)).alias("__offset"),
        F.coalesce(F.sum("__chunk_cnt").over(w_chunks), F.lit(0)).alias(
            "__prior_cnt"
        ),
    )
    # NULL semantics must match the global window: a row whose prefix
    # holds no non-null value gets NULL, not 0 — so an all-NULL local
    # prefix carries the prior-chunk total only if some prior chunk had
    # a non-null value
    combined = (
        F.when(
            F.col("__local_cum").isNotNull(),
            F.col("__local_cum") + F.col("__offset"),
        )
        .when(F.col("__prior_cnt") > 0, F.col("__offset"))
        .otherwise(F.lit(None))
    )
    return (
        local.join(F.broadcast(offsets), "__chunk")
        .withColumn(out, combined)
        .drop("__chunk", "__local_cum", "__offset", "__prior_cnt")
    )


def exscan_chunked(
    t: DataFrame,
    value: str,
    order_by: str,
    out: str = "exscan",
    partition_by: str | None = None,
    num_chunks: int = 1024,
) -> DataFrame:
    """EXCLUSIVE chunked prefix sum (MPI_Exscan proper, reference
    src/distributed-pass.jl:1213) — ``out`` = sum of ``value`` over all
    STRICTLY-PRIOR rows in ``order_by`` order, 0 for the first row;
    empty prefixes yield 0 (the packing/offset use case, not the
    NULL-propagating analytics one — see cumsum_chunked for that).

    With ``partition_by`` the scan restarts per group but — unlike a
    plain partitioned window — no task ever sorts a whole group: rows
    range-partition on (group, order) so a group spanning 90% of the
    data spreads over ~90% of the chunks, each chunk scans locally, and
    the only per-group serial object is its ≤num_chunks-row offset
    table (VERDICT r03 #4: the sequence-packing scale path).
    """
    from pyspark import StorageLevel

    keys = ([F.col(partition_by)] if partition_by else []) + [F.col(order_by)]
    tiled = (
        t.repartitionByRange(num_chunks, *keys)
        .withColumn("__chunk", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    grp = ([partition_by] if partition_by else []) + ["__chunk"]
    w_in = (
        Window.partitionBy(*grp)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tiled.withColumn(
        "__local_ex", F.coalesce(F.sum(value).over(w_in), F.lit(0))
    )
    chunk_sums = tiled.groupBy(*grp).agg(F.sum(value).alias("__chunk_sum"))
    w_chunks = (
        (Window.partitionBy(partition_by) if partition_by else Window.partitionBy())
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_sums.select(
        *grp,
        F.coalesce(F.sum("__chunk_sum").over(w_chunks), F.lit(0)).alias("__offset"),
    )
    return (
        local.join(F.broadcast(offsets), grp)
        .withColumn(out, F.col("__local_ex") + F.col("__offset"))
        .drop("__chunk", "__local_ex", "__offset")
    )


def stencil_3pt(
    t: DataFrame,
    value: str,
    order_by: str,
    weights: tuple[float, float, float] = (1.0, 2.0, 1.0),
    denom: float = 4.0,
    out: str = "stencil",
    partition_by: str | None = None,
) -> DataFrame:
    """3-point stencil ``(w0*x[-1] + w1*x[0] + w2*x[1]) / denom`` with the
    reference's boundary rule: the first and last element pass through
    unchanged (``oob_skip``, reference src/distributed-pass.jl:882-1001;
    golden test/stencil_test1.jl:35).

    Reference: MPI_Isend/Irecv halo exchange of boundary elements. Spark:
    lag/lead over an ordered window — the shuffle boundary exchange is
    the same halo, handled by the engine.
    """
    base = Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    w = base.orderBy(order_by)
    prev, nxt = F.lag(value).over(w), F.lead(value).over(w)
    smoothed = (
        weights[0] * prev + weights[1] * F.col(value) + weights[2] * nxt
    ) / F.lit(denom)
    # boundaries (no neighbor) pass through
    return t.withColumn(
        out,
        F.when(prev.isNull() | nxt.isNull(), F.col(value)).otherwise(smoothed),
    )


def top_k(t: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """``sort!(result, by=:c)[1:k]`` (reference designed-only syntax,
    examples/queries_devel/q25.jl:25). Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver, no global sort. Pass a unique tiebreaker column for
    deterministic results.
    """
    return t.orderBy(*order).limit(k)


def rank_in_group(
    t: DataFrame,
    partition_by: str,
    order_by: list[Column | str],
    out: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """Ranking/analytic surface (absent in the reference — SURVEY §2.5).

    Partitioned window → fully parallel; skewed groups are the only
    scale hazard.
    """
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    return t.withColumn(out, fns[method]().over(w))


def top_k_per_group(
    t: DataFrame, partition_by: str, order_by: list[Column | str], k: int
) -> DataFrame:
    """Top-k rows per group — window row_number + filter; Catalyst 4.x
    rewrites this to a rank-limit per partition (no full materialization).
    """
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def resample_ffill(
    t: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "interval 1 day",
    unit: str = "day",
    value_agg: Column | None = None,
) -> DataFrame:
    """Regularize an irregular time series: per key, emit one row per
    grid step over the table's GLOBAL time span, carrying the last
    observed value forward across gaps (NULL before a key's first
    observation). Output: (key, grid_ts, value) with value_col's name.

    Scale shape: the grid is |keys| × |steps| rows built from a
    broadcast one-row span — never a range materialized per key on the
    driver. The left join and the forward-fill window both hash on the
    key, so the fill reuses the join's partitioning; the window frame is
    running (UNBOUNDED PRECEDING..CURRENT ROW), which Spark evaluates
    streaming per partition — no per-key buffering of the whole series.
    """
    d0, d1 = f"__d0", f"__d1"
    span = t.agg(
        F.date_trunc(unit, F.min(ts_col)).alias(d0),
        F.date_trunc(unit, F.max(ts_col)).alias(d1),
    )
    grid_ts = F.explode(F.sequence(F.col(d0), F.col(d1), F.expr(step)))
    steps = span.select(grid_ts.alias("__grid_ts"))
    keys = t.select(key).distinct()
    grid = keys.crossJoin(F.broadcast(steps))
    obs = t.groupBy(
        key, F.date_trunc(unit, F.col(ts_col)).alias("__grid_ts")
    ).agg(
        (value_agg if value_agg is not None else F.last(value_col)).alias("__obs")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key, "__grid_ts"], "left")
        .select(
            key,
            F.col("__grid_ts").alias(ts_col),
            F.last("__obs", ignorenulls=True).over(w).alias(value_col),
        )
    )


def ewma_regular(
    t: DataFrame,
    key: str,
    order_by: str,
    value_col: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over a regularly-indexed
    series, per key: y_0 = x_0, y_t = (1-α)·y_{t-1} + α·x_t.

    The recurrence looks inherently sequential, but rebasing to
    z_i = x_i·(1-α)^{-i} turns it into a running SUM:
    y_t = (1-α)^t · [(1-α)·x_0·... closed form
    y_t = r^t·((1-r)·Z_t + r·x_0·(1)/(1)) with r = 1-α and
    Z_t = Σ_{i≤t} x_i·r^{-i} — i.e. one window prefix sum plus scalar
    math, fully distributed (hash on key, streaming frame). No UDF, no
    per-key driver loop.

    Numerical bound: r^{-i} grows as (1/(1-α))^i — keep per-key series
    length × |log(1-α)| ≲ 700 (double overflow); for longer series or
    α→1 use an applyInPandas kernel instead (bounded per-key state).
    """
    r = 1.0 - alpha
    w = Window.partitionBy(key).orderBy(order_by)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    i = (F.row_number().over(w) - 1).cast("double")
    z = F.col(value_col) / F.pow(F.lit(r), F.row_number().over(w) - 1)
    zsum = F.sum(z).over(run)
    first = F.first(value_col).over(w)
    y = F.pow(F.lit(r), i) * (
        F.lit(1.0 - r) * (zsum - first) + first
    )
    return t.withColumn(out, y)
