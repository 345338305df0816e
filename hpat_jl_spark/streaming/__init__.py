"""Structured Streaming surface — entirely NEW capability (SURVEY §2.8:
the reference has no streaming operators at all; its designed-but-dead
q02 sessionization is the motivating example). Batch operators from
operators/ are reused unchanged where Spark allows (same DataFrame API).
"""

from hpat_jl_spark.streaming.sources import stream_events  # noqa: F401
from hpat_jl_spark.streaming.windows import (  # noqa: F401
    sessionize_stream,
    sliding_counts,
    tumbling_counts,
)
