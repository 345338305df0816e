"""Streaming sources over the fixture `events` table.

The file source replays a parquet directory as a stream (schema must be
declared — streaming reads don't infer). In production the same
transformations run over Kafka/Kinesis sources; the query code below is
source-agnostic because it only sees the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events schema as the STREAM sees it (ts arrives as raw ns long from
# the driver fixtures — converted on read, mirroring tables.load_table)
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of events parquet files.

    ``events_dir`` is a directory containing events parquet part-files
    (tests stage the fixture file into a tmp dir — the file source
    watches directories, not single files)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_EVENTS_RAW).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(events_dir)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
