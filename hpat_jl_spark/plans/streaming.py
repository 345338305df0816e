"""Driver-gated streaming queries: Structured Streaming plans executed
to completion inside a registered query via an ``availableNow`` trigger,
so the streaming layer gets DuckDB-oracle CORRECTNESS rows instead of
resting on tests alone.

``availableNow`` processes every file present at start and terminates —
the streaming micro-batch engine runs the real stateful operators
(window aggregation state store, watermarks), but the result is a
deterministic function of the fixture, so a plain batch GROUP BY is an
exact oracle. This IS the stream==batch equivalence the tests pin,
promoted to the driver gate. Reference analogue: none (SURVEY §2.8 —
the reference has no streaming); this is the new-surface layer.

At scale the same plan runs unbounded (Kafka source, append mode with
watermark eviction bounding state); the memory sink + complete mode here
are the bounded-replay twin — complete mode because the final windows
would otherwise sit unemitted behind the watermark at end-of-stream.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.registry import register
from hpat_jl_spark.streaming.sources import stream_events
from hpat_jl_spark.streaming.windows import tumbling_counts


def _stage_events_dir(sf_dir: str) -> str:
    """File-source streams watch directories; symlink the fixture file
    into a fresh temp dir (no copy)."""
    d = tempfile.mkdtemp(prefix="hpat_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet")
    )
    return d


_stream_tumbling_oracle = """
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("stream_tumbling_counts", oracle=_stream_tumbling_oracle, tags=("streaming",))
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour per-event-type counts computed BY THE STREAMING
    ENGINE (state store, micro-batches) over a bounded replay of the
    events fixture; the oracle is the equivalent batch GROUP BY — the
    hash match proves the streaming window operator agrees with batch
    semantics exactly (hour-aligned windows == date_trunc).

    The memory-sink table name is unique per invocation so repeated
    runs (the determinism sweep runs every query twice) never collide.
    """
    ev = stream_events(spark, _stage_events_dir(sf_dir))
    sink = f"stream_tumbling_{uuid.uuid4().hex[:12]}"
    q = (
        tumbling_counts(ev, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("start").alias("win_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        "total_value",
    )
