"""Streaming windowed aggregations: tumbling / sliding / session
windows with watermark-based late-data handling — all new surface
(SURVEY §2.8). The session window realizes the reference's designed q02
gap-sessionization (examples/queries_devel/q02.jl) in streaming form;
the batch twin is plans/windowed.sessionize_events.

Scale notes: state for windowed aggs is bounded by the watermark (late
rows beyond it are dropped and state evicted); session windows merge
per key — skewed users produce hot state partitions, mitigated by the
same AQE/salting discipline as batch skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-type counts in non-overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("win.start", "win.end", "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("win.start", "win.end", "event_type", "n_events")
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich the stream with a dimension table
    (re-read per micro-batch; broadcast by Catalyst when small). The
    streaming plan is identical to the batch join — the static side is
    simply not incremental."""
    return events.join(dim, on, "left")


def stream_stream_purchase_after_view(
    events: DataFrame,
    watermark: str = "1 hour",
    window_seconds: int = 3600,
) -> DataFrame:
    """Stream-stream inner join: purchases matched to views by the same
    user within the preceding ``window_seconds``. Both sides buffer
    state bounded by the watermark + the time-range condition (Spark
    evicts rows that can no longer match)."""
    from pyspark.sql import functions as F2

    views = (
        events.filter(F2.col("event_type") == "view")
        .select(
            F2.col("user_id").alias("v_user"),
            F2.col("ts").alias("v_ts"),
            F2.col("value").alias("v_value"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F2.col("event_type") == "purchase")
        .select(
            F2.col("user_id").alias("p_user"),
            F2.col("ts").alias("p_ts"),
            F2.col("event_id").alias("p_event_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        (F2.col("p_user") == F2.col("v_user"))
        & (F2.col("v_ts") <= F2.col("p_ts"))
        & (F2.col("v_ts") >= F2.col("p_ts") - F2.expr(f"INTERVAL {window_seconds} SECONDS")),
        "inner",
    ).select("p_event_id", "p_user", "p_ts", "v_ts", "v_value")


def sessionize_stream(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per user (q02 semantics): a session extends
    while events arrive within ``gap``; watermark closes sessions and
    evicts their state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_to_warehouse(
    windowed_agg: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("event_type",),
):
    """Write a windowed streaming aggregate to a partitioned Parquet
    "warehouse" via foreachBatch with DYNAMIC partition overwrite.

    Correctness invariant (ADVICE r01): in update mode a micro-batch
    emits ONLY the groups whose aggregate changed, so the overwrite
    granularity must be exactly one group, never a coarser bucket. If
    partitions were keyed by hour alone, a batch updating one group
    would silently delete every sibling group already written into that
    hour. Partitions are therefore the EXACT window start
    (``win_part``, second granularity — distinct sliding/short windows
    inside one hour land in distinct partitions) crossed with the full
    non-window grouping key ``key_cols``; each partition holds exactly
    one aggregate row, and dynamic overwrite becomes per-group upsert.
    A retried batch rewrites the same partitions in place — idempotent
    delivery without a transactional table format.

    One-partition-per-group is the files-as-warehouse tradeoff: fine
    for windowed aggregates (cardinality = windows × key values); a
    high-cardinality key wants a transactional format with MERGE plus
    periodic compaction (operators/maintenance.compact_parquet)
    instead.

    Expects ``windowed_agg`` to carry a ``start`` column (window start)
    and every column in ``key_cols``. Returns the started query.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn(
                "win_part", F.date_format("start", "yyyy-MM-dd-HH-mm-ss")
            )
            .write.mode("overwrite")
            .partitionBy("win_part", *key_cols)
            .parquet(out_dir)
        )

    return (
        windowed_agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
